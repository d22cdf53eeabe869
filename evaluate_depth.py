"""CLI: eigen-split depth evaluation (reference evaluate_depth.py
equivalent): load weights, run inference over the eigen test split, apply
the garg-crop / median-scaling protocol, print the 7-metric row.
"""

from fusiondepth_tpu.config import parse_args


def main():
    cfg = parse_args()
    # exactly one of --eval_mono / --eval_stereo must be chosen
    # (reference evaluate_depth.py:81-83)
    assert sum((cfg.eval_mono, cfg.eval_stereo)) == 1, (
        "Please choose mono or stereo evaluation by setting either "
        "--eval_mono or --eval_stereo")
    from fusiondepth_tpu.training.eval_driver import evaluate

    evaluate(cfg)


if __name__ == "__main__":
    main()
