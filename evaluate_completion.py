"""CLI: depth-completion evaluation (reference evaluate_completion.py
equivalent): rmse/mae/irmse/imae in mm over the select/full val split, or
16-bit png export for the anonymous test set.
"""

from fusiondepth_tpu.config import parse_args


def main():
    cfg = parse_args()
    import os

    import numpy as np

    from fusiondepth_tpu.data.completion_dataset import KITTICompletion
    from fusiondepth_tpu.data.loader import DataLoader
    from fusiondepth_tpu.training.completor import (
        Completor,
        completion_metrics,
    )
    from fusiondepth_tpu.training import checkpoint as ckpt

    if not cfg.completion_not_full_res:
        cfg = cfg.replace(height=352, width=1216)
    dataset = KITTICompletion(cfg.data_path, is_train=False,
                              val_split=cfg.completion_val, cfg=cfg)
    comp = Completor(cfg, None, dataset)
    if cfg.load_weights_folder and os.path.isdir(cfg.load_weights_folder):
        comp.state, _ = ckpt.load_checkpoint(cfg.load_weights_folder,
                                             comp.state)

    if cfg.completion_test:
        out_dir = os.path.join(cfg.log_dir, "completion_test_export")
        os.makedirs(out_dir, exist_ok=True)
        loader = DataLoader(dataset, cfg.eval_batch_size)
        idx = 0
        from PIL import Image

        for batch in loader:
            depth = comp.predict_depth(batch)
            for d in depth:
                png = np.clip(d * 256.0, 0, 65535).astype(np.uint16)
                Image.fromarray(png).save(
                    os.path.join(out_dir, f"{idx:010d}.png"))
                idx += 1
        print(f"exported {idx} test depth maps -> {out_dir}")
        return

    metrics = comp.validate()
    print("  rmse(mm)     mae(mm)   irmse(1/km)  imae(1/km)")
    print("  {rmse:9.2f} {mae:9.2f} {irmse:11.3f} {imae:11.3f}".format(
        **metrics))


if __name__ == "__main__":
    main()
