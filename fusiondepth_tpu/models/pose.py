"""Pose networks: PoseDecoder over encoder features and the standalone
PoseCNN, matching reference networks/pose_decoder.py / pose_cnn.py.

NHWC layout. Outputs are (axisangle, translation), each
(B, num_frames_to_predict_for, 1, 3), scaled by 0.01 as in the reference.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


class PoseDecoder(nn.Module):
    """1x1 squeeze(s) -> three convs -> global mean -> 0.01 * (aa, t).

    Reference: networks/pose_decoder.py:8-51. `beam_last_feature`, when
    given, is added to the (single) input feature before the squeeze
    (reference :30-32).
    """

    num_input_features: int = 1
    num_frames_to_predict_for: Optional[int] = None
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_features: Sequence[jnp.ndarray],
                 beam_last_feature: Optional[jnp.ndarray] = None):
        n_pred = self.num_frames_to_predict_for
        if n_pred is None:
            n_pred = self.num_input_features - 1

        if beam_last_feature is not None:
            feats = [last_features[0] + beam_last_feature]
        else:
            feats = list(last_features)

        # one shared squeeze conv applied to every input feature
        # (reference pose_decoder.py:20,35)
        squeeze = nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")
        squeezed = [nn.relu(squeeze(f.astype(self.dtype))) for f in feats]
        out = jnp.concatenate(squeezed, axis=-1)

        out = nn.Conv(256, (3, 3), (self.stride, self.stride), padding=1,
                      dtype=self.dtype, name="pose_0")(out)
        out = nn.relu(out)
        out = nn.Conv(256, (3, 3), (self.stride, self.stride), padding=1,
                      dtype=self.dtype, name="pose_1")(out)
        out = nn.relu(out)
        out = nn.Conv(6 * n_pred, (1, 1), dtype=self.dtype,
                      name="pose_2")(out)

        out = out.mean(axis=(1, 2))  # global average over H, W
        out = 0.01 * out.reshape(-1, n_pred, 1, 6).astype(
            jnp.promote_types(out.dtype, jnp.float32))
        return out[..., :3], out[..., 3:]


class PoseCNN(nn.Module):
    """7-conv stride-2 stack on channel-concatenated frames -> pose.

    Reference: networks/pose_cnn.py:7-44.
    """

    num_input_frames: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        specs = [  # (features, kernel, stride, pad)
            (16, 7, 2, 3),
            (32, 5, 2, 2),
            (64, 3, 2, 1),
            (128, 3, 2, 1),
            (256, 3, 2, 1),
            (256, 3, 2, 1),
            (256, 3, 2, 1),
        ]
        out = x.astype(self.dtype)
        for i, (f, k, s, p) in enumerate(specs):
            out = nn.Conv(f, (k, k), (s, s), padding=p, dtype=self.dtype,
                          name=f"conv_{i}")(out)
            out = nn.relu(out)
        out = nn.Conv(6 * (self.num_input_frames - 1), (1, 1),
                      dtype=self.dtype, name="pose_conv")(out)
        out = out.mean(axis=(1, 2))
        out = 0.01 * out.reshape(
            -1, self.num_input_frames - 1, 1, 6).astype(
            jnp.promote_types(out.dtype, jnp.float32))
        return out[..., :3], out[..., 3:]
