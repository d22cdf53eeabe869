"""CLI: stage-1 self-supervised training (reference trainer.py equivalent).

Usage: python trainer.py [--num_layers 18 --height 192 --width 640 ...]
"""

from fusiondepth_tpu.config import parse_args


def main():
    cfg = parse_args()
    # multi-host bring-up must precede first backend use
    # (--coordinator_address/--num_processes; parallel/multihost.py)
    from fusiondepth_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed(cfg)
    from fusiondepth_tpu.training.trainer import Trainer

    trainer = Trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main()
