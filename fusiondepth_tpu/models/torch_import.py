"""torchvision ResNet state-dict -> Flax ResnetEncoder variables converter.

Covers the reference's pretrained-init paths (resnet_encoder.py:33-50,
weights_init="pretrained"): ImageNet weights for ResNet-18/34/50/101/152,
including the multi-image pose-encoder variant where conv1 is tiled across
N input images and divided by N (resnet_multiimage_input,
resnet_encoder.py:46-49). First-conv fusion variants (2/4/5/6-channel)
keep the torch weights where channel counts match and fall back to the
existing initialization otherwise.

Works on plain {name: numpy array} dicts — load a .pth with torch (CPU) and
call `torch_state_dict_to_numpy` first; no torch dependency here.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from fusiondepth_tpu.models.resnet import RESNET_STAGES


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Detach a torch state dict to numpy (call with torch available)."""
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in state_dict.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _adapt_conv1(w_torch: np.ndarray, in_channels: int,
                 num_input_images: int) -> np.ndarray:
    """Adapt the 3-channel ImageNet conv1 to the encoder's input width."""
    if num_input_images > 1 and in_channels == 3 * num_input_images:
        w_torch = np.concatenate(
            [w_torch] * num_input_images, axis=1) / num_input_images
    return w_torch


def convert_resnet(
    torch_sd: Dict[str, np.ndarray],
    depth: int,
    in_channels: int = 3,
    num_input_images: int = 1,
    existing_variables: Dict[str, Any] | None = None,
) -> Dict[str, Any]:
    """Build {params, batch_stats} for ResnetEncoder from torch weights.

    When `in_channels` differs from what the torch conv1 provides (fusion
    first-conv swaps), conv1 keeps the value from `existing_variables`
    (required in that case).
    """
    stages = RESNET_STAGES[depth]
    bottleneck = depth > 34

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(flax_name, torch_prefix):
        params[flax_name] = {
            "scale": torch_sd[f"{torch_prefix}.weight"],
            "bias": torch_sd[f"{torch_prefix}.bias"],
        }
        stats[flax_name] = {
            "mean": torch_sd[f"{torch_prefix}.running_mean"],
            "var": torch_sd[f"{torch_prefix}.running_var"],
        }

    conv1 = _adapt_conv1(torch_sd["conv1.weight"], in_channels,
                         num_input_images)
    if conv1.shape[1] == in_channels:
        params["conv1"] = {"kernel": _conv(conv1)}
    else:
        assert existing_variables is not None, (
            f"conv1 expects {in_channels} channels but torch weights have "
            f"{conv1.shape[1]}; pass existing_variables for the fallback")
        params["conv1"] = existing_variables["params"]["conv1"]
    put_bn("bn1", "bn1")

    n_convs = 3 if bottleneck else 2
    for stage_i, n_blocks in enumerate(stages):
        for block_i in range(n_blocks):
            tp = f"layer{stage_i + 1}.{block_i}"
            fp = f"layer{stage_i + 1}_{block_i}"
            block_params: Dict[str, Any] = {}
            block_stats: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                block_params[f"conv{ci}"] = {
                    "kernel": _conv(torch_sd[f"{tp}.conv{ci}.weight"])}
                block_params[f"bn{ci}"] = {
                    "scale": torch_sd[f"{tp}.bn{ci}.weight"],
                    "bias": torch_sd[f"{tp}.bn{ci}.bias"],
                }
                block_stats[f"bn{ci}"] = {
                    "mean": torch_sd[f"{tp}.bn{ci}.running_mean"],
                    "var": torch_sd[f"{tp}.bn{ci}.running_var"],
                }
            if f"{tp}.downsample.0.weight" in torch_sd:
                block_params["downsample_conv"] = {
                    "kernel": _conv(torch_sd[f"{tp}.downsample.0.weight"])}
                block_params["downsample_bn"] = {
                    "scale": torch_sd[f"{tp}.downsample.1.weight"],
                    "bias": torch_sd[f"{tp}.downsample.1.bias"],
                }
                block_stats["downsample_bn"] = {
                    "mean": torch_sd[f"{tp}.downsample.1.running_mean"],
                    "var": torch_sd[f"{tp}.downsample.1.running_var"],
                }
            params[fp] = block_params
            stats[fp] = block_stats

    as_jnp = lambda tree: tree  # values stay numpy; flax accepts them
    return {"params": as_jnp(params), "batch_stats": as_jnp(stats)}


def load_pretrained_encoder(pth_path: str, depth: int, in_channels: int = 3,
                            num_input_images: int = 1,
                            existing_variables=None) -> Dict[str, Any]:
    """Load a torchvision .pth checkpoint and convert (requires torch)."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("encoder.", ""): v for k, v in sd.items()}
    return convert_resnet(torch_state_dict_to_numpy(sd), depth,
                          in_channels, num_input_images,
                          existing_variables)
