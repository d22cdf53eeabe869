"""Pretrained ImageNet initialization (weights_init="pretrained").

The reference builds every ResNet encoder from torchvision ImageNet weights
(reference networks/resnet_encoder.py:33-50, options.py:115-119):

  - depth encoder: pretrained; conv1 replaced by a fresh 4/5-channel conv for
    the cat_4beam_to_color / cat2start fusion variants (resnet_encoder.py:77-79)
  - beam encoders: pretrained trunk, fresh 2- or 2N-channel conv1
    (resnet_encoder.py:80-84)
  - pose encoder: multi-image variant — conv1 tiled across N frames and
    divided by N (resnet_encoder.py:46-49)

Weight-source resolution (no torchvision dependency; zero-egress friendly):
  1. cfg.pretrained_weights_path — a single .pth file, or a directory
     containing torchvision-format ``resnet{depth}*.pth`` checkpoints;
  2. the torch hub cache: ($TORCH_HOME | ~/.cache/torch)/hub/checkpoints.

If no checkpoint is found the affected encoder keeps its random init and a
warning is printed once (the reference downloads from the model zoo instead,
which is impossible in an air-gapped deployment).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional

from fusiondepth_tpu.config import Config


def find_checkpoint(depth: int, path: Optional[str] = None) -> Optional[str]:
    """Locate a torchvision-format ResNet-{depth} .pth checkpoint."""
    if path:
        if os.path.isfile(path):
            return path
        hits = sorted(glob.glob(os.path.join(path, f"resnet{depth}*.pth")))
        if hits:
            return hits[0]
    torch_home = os.environ.get(
        "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache", "torch"))
    hits = sorted(glob.glob(
        os.path.join(torch_home, "hub", "checkpoints", f"resnet{depth}*.pth")))
    return hits[0] if hits else None


_warned: set = set()

# last apply_pretrained outcome per encoder name: True = torch weights
# applied, False = checkpoint missing (kept random). bench.py records this
# so every benchmark states which init actually ran.
APPLIED: Dict[str, bool] = {}


def _warn_once(key: str, msg: str) -> None:
    import sys

    if key not in _warned:
        _warned.add(key)
        # stderr: bench.py's stdout contract is a single JSON line
        print(f"WARNING: {msg}", file=sys.stderr, flush=True)


def apply_pretrained(cfg: Config, nets, variables: Dict[str, Any]
                     ) -> Dict[str, Any]:
    """Replace encoder variables with converted ImageNet weights.

    `nets` is a FusionNets bundle; `variables` its freshly-initialized
    variables tree. Returns the tree with every ResNet encoder whose
    checkpoint is found rebuilt from torch weights (channel-mismatched
    conv1 keeps the random init, per the reference's first-conv swaps).
    """
    from fusiondepth_tpu.models.torch_import import load_pretrained_encoder

    n_pose = cfg.num_pose_frames
    # (variables key, resnet depth, conv1 input channels, num_input_images)
    specs = [("encoder", cfg.num_layers, nets.encoder.in_channels, 1)]
    if "beam_encoder" in variables:
        specs.append(("beam_encoder", cfg.num_layers, 2, 1))
    if "beam_encoder_pose" in variables:
        specs.append(("beam_encoder_pose", nets.pose_depth, 2 * n_pose,
                      n_pose))
    if "pose_encoder" in variables:
        specs.append(("pose_encoder", nets.pose_depth, 3 * n_pose, n_pose))

    out = dict(variables)
    for name, depth, in_ch, n_imgs in specs:
        pth = find_checkpoint(depth, cfg.pretrained_weights_path)
        APPLIED[name] = pth is not None
        if pth is None:
            _warn_once(
                f"resnet{depth}",
                f"weights_init='pretrained' but no resnet{depth} checkpoint "
                f"found (looked in pretrained_weights_path="
                f"{cfg.pretrained_weights_path!r} and the torch hub cache); "
                f"'{name}' keeps its random init")
            continue
        out[name] = load_pretrained_encoder(
            pth, depth, in_channels=in_ch, num_input_images=n_imgs,
            existing_variables=variables[name])
    return out
