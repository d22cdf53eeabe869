"""CLI: depth-completion training at 352x1216 (reference completor.py
equivalent).
"""

from fusiondepth_tpu.config import parse_args


def main():
    cfg = parse_args()
    from fusiondepth_tpu.data.completion_dataset import KITTICompletion
    from fusiondepth_tpu.training.completor import Completor

    data = cfg.data_path
    train = KITTICompletion(data, frame_ids=cfg.frame_ids, is_train=True,
                            val_split=cfg.completion_val, cfg=cfg)
    val = KITTICompletion(data, is_train=False,
                          val_split=cfg.completion_val, cfg=cfg)
    Completor(cfg, train, val).train()


if __name__ == "__main__":
    main()
