"""Run two same-depth ResNet encoders as ONE grouped-conv pass.

The fusion architecture runs FOUR ResNet-18 encoders per step (depth 3ch
+ beam 2ch at B, pose 6ch + beam-pose 4ch at 2B — reference
trainer.py:66-115). Each runs its C=64 stages at 50% of the 128 TPU
lanes. Pairing the two encoders of each branch into one pass with
`feature_group_count=2` convolutions (block-grouped kernels built on the
fly by concatenating the two param trees' kernels) runs every conv at
FULL lane density and halves the number of passes — exact math, since
groups never mix channels and BatchNorm is per-channel either way.

The parameter/stat trees stay exactly the two encoders' flax trees
(checkpoints, torchvision import, and the unpaired path are untouched);
pairing is purely an apply-time transformation. First convs with unequal
in_channels are zero-padded (zero kernel rows x zero input channels —
exact).

Both consumers of the paired output use the SUM of the two encoders'
features (additive beam fusion: depth_decoder adds beam features at
every level, reference depth_decoder.py:69-80; pose_decoder adds the
beam last feature, pose_decoder.py:30-32), so the paired (…, 2C) feature
maps are reduced by summing lane halves — no split/relayout of raw
halves on the hot path.

Basic-block ResNets only (18/34); callers gate on depth.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from fusiondepth_tpu.models.resnet import RESNET_STAGES, max_pool_3x3s2

_MOMENTUM = 0.9
_EPS = 1e-5


def _conv_pair(pa, pb, x, *, stride=1, pad=1, dtype):
    """Grouped conv with the two trees' kernels block-concatenated.

    pa/pb: param dicts holding 'kernel' (kh, kw, Cin, Cout). Unequal Cin
    (first conv) is zero-padded to the max.
    """
    ka, kb = pa["kernel"], pb["kernel"]
    cin = max(ka.shape[2], kb.shape[2])

    def _pad(k):
        if k.shape[2] == cin:
            return k
        return jnp.pad(k, ((0, 0), (0, 0), (0, cin - k.shape[2]), (0, 0)))

    kg = jnp.concatenate([_pad(ka), _pad(kb)], axis=3).astype(dtype)
    kh = kg.shape[0]
    p = ((pad, pad), (pad, pad)) if kh > 1 else ((0, 0), (0, 0))
    return jax.lax.conv_general_dilated(
        x, kg, (stride, stride), p,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2)


class _BN:
    """Paired BatchNorm over concatenated channel halves — the same
    low-precision-friendly folding as models/norm.BatchNorm, with batch
    stats computed jointly (per-channel, so identical to separate) and
    running stats written back into each tree's update dict."""

    def __init__(self, train: bool, dtype):
        self.train = train
        self.dtype = dtype

    def __call__(self, name, pa, pb, sa, sb, ua, ub, x):
        scale = jnp.concatenate([pa[name]["scale"], pb[name]["scale"]])
        bias = jnp.concatenate([pa[name]["bias"], pb[name]["bias"]])
        C = pa[name]["scale"].shape[0]
        if self.train:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=red, dtype=jnp.float32)
            mean2 = jnp.mean(x * x, axis=red, dtype=jnp.float32)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            m = _MOMENTUM
            for u, s, sl in ((ua, sa, slice(0, C)), (ub, sb, slice(C, None))):
                u.setdefault(name, {})
                u[name]["mean"] = m * s[name]["mean"] + (1 - m) * mean[sl]
                u[name]["var"] = m * s[name]["var"] + (1 - m) * var[sl]
        else:
            mean = jnp.concatenate([sa[name]["mean"], sb[name]["mean"]])
            var = jnp.concatenate([sa[name]["var"], sb[name]["var"]])
        inv = jax.lax.rsqrt(var + _EPS) * scale
        A = inv.astype(self.dtype)
        Bc = (bias - mean * inv).astype(self.dtype)
        return x.astype(self.dtype) * A + Bc


def paired_resnet_apply(
    enc_depth: int,
    vars_a: Dict[str, Any],
    vars_b: Dict[str, Any],
    xa: jnp.ndarray,
    xb: jnp.ndarray,
    *,
    train: bool,
    dtype,
    normalize_input: bool = True,
) -> Tuple[List[jnp.ndarray], Dict[str, Any], Dict[str, Any]]:
    """Paired forward of two basic-block ResNets.

    Returns (paired feature pyramid [(B, h, w, 2C) x5], updates_a,
    updates_b) where updates_* are {'batch_stats': ...} dicts matching
    flax's mutable return (empty when train=False).
    """
    assert enc_depth <= 34, "paired apply implements basic blocks only"
    stages = RESNET_STAGES[enc_depth]
    pa, pb = vars_a["params"], vars_b["params"]
    sa = vars_a.get("batch_stats", {})
    sb = vars_b.get("batch_stats", {})
    ua: Dict[str, Any] = {}
    ub: Dict[str, Any] = {}
    bn = _BN(train, dtype)

    if normalize_input:
        xa = (xa - 0.45) / 0.225
        xb = (xb - 0.45) / 0.225
    xa = xa.astype(dtype)
    xb = xb.astype(dtype)
    cin = max(xa.shape[-1], xb.shape[-1])

    def _padx(t):
        if t.shape[-1] == cin:
            return t
        return jnp.pad(t, ((0, 0),) * (t.ndim - 1)
                       + ((0, cin - t.shape[-1]),))

    x = jnp.concatenate([_padx(xa), _padx(xb)], axis=-1)

    features = []
    y = _conv_pair(pa["conv1"], pb["conv1"], x, stride=2, pad=3, dtype=dtype)
    y = jax.nn.relu(bn("bn1", pa, pb, sa, sb, ua, ub, y))
    features.append(y)
    y = max_pool_3x3s2(y)

    widths = (64, 128, 256, 512)
    for stage_i, (w, n_blocks) in enumerate(zip(widths, stages)):
        for block_i in range(n_blocks):
            stride = 2 if (stage_i > 0 and block_i == 0) else 1
            nm = f"layer{stage_i + 1}_{block_i}"
            pa_b, pb_b = pa[nm], pb[nm]
            sa_b = sa.get(nm, {})
            sb_b = sb.get(nm, {})
            ua_b = ua.setdefault(nm, {})
            ub_b = ub.setdefault(nm, {})
            identity = y
            z = _conv_pair(pa_b["conv1"], pb_b["conv1"], y, stride=stride,
                           dtype=dtype)
            z = jax.nn.relu(bn("bn1", pa_b, pb_b, sa_b, sb_b, ua_b, ub_b, z))
            z = _conv_pair(pa_b["conv2"], pb_b["conv2"], z, dtype=dtype)
            z = bn("bn2", pa_b, pb_b, sa_b, sb_b, ua_b, ub_b, z)
            if identity.shape[-1] != z.shape[-1] or stride != 1:
                identity = _conv_pair(pa_b["downsample_conv"],
                                      pb_b["downsample_conv"], y,
                                      stride=stride, pad=0, dtype=dtype)
                identity = bn("downsample_bn", pa_b, pb_b, sa_b, sb_b,
                              ua_b, ub_b, identity)
            y = jax.nn.relu(z + identity)
        features.append(y)

    upd_a = {"batch_stats": ua} if train else {}
    upd_b = {"batch_stats": ub} if train else {}
    return features, upd_a, upd_b


def sum_halves(paired: jnp.ndarray) -> jnp.ndarray:
    """(…, 2C) paired features -> (…, C) additive fusion of the halves."""
    C = paired.shape[-1] // 2
    return paired[..., :C] + paired[..., C:]


def split_halves(paired: jnp.ndarray):
    C = paired.shape[-1] // 2
    return paired[..., :C], paired[..., C:]
