"""Flax ResNet encoder family (18/34/50/101/152) with the fusion first-conv
variants of the reference (resnet_encoder.py:53-103).

TPU-first design notes:
- NHWC layout, convs lower straight onto the MXU.
- Returns the 5-level feature pyramid [stem_relu, layer1..layer4] with
  channels RESNET_FEATURE_CHANNELS[depth].
- `in_channels` generalizes the reference's conv1 swap-outs: 3 (RGB),
  4 (cat4beam), 5 (cat2channel), 2 or 2N (beam encoder), 6 (refine encoder),
  3N (multi-image pose encoder).
- Input normalization (x - 0.45) / 0.225 is built in, matching
  resnet_encoder.py:94.
- BatchNorm with running stats (mutable 'batch_stats' collection), matching
  torchvision eps=1e-5, momentum 0.1.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from fusiondepth_tpu.models.norm import BatchNorm
from fusiondepth_tpu.ops import pallas_fold_conv

RESNET_STAGES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}

RESNET_FEATURE_CHANNELS = {
    18: (64, 64, 128, 256, 512),
    34: (64, 64, 128, 256, 512),
    50: (64, 256, 512, 1024, 2048),
    101: (64, 256, 512, 1024, 2048),
    152: (64, 256, 512, 1024, 2048),
}


class _S2DStemConv(nn.Module):
    """conv1 as a space-to-depth 4x4 stride-1 conv (exact 7x7/2 rewrite).

    The strided 7x7 stem lowers poorly on TPU (XLA materializes an
    im2col-style chain for its weight gradient — see scripts/inspect_hlo.py);
    rewriting it over a 2x2 space-to-depth grid gives a stride-1 4x4 conv
    with 4x the input channels, identical math:

        out(i,j) = sum_{dy,dx in [-3,3]} w[dy,dx] x[2i+dy, 2j+dx]
                 = sum_{a,b in [0,4)} w4[a,b] xs2d[i+a-2, j+b-2]

    with w4 the 7x7 kernel zero-padded to 8x8 at the front and regrouped
    (2ab+p -> a, p). The param keeps nn.Conv's exact name/shape/init
    ("kernel", (7,7,C,64)), so checkpoints and torchvision import are
    unchanged; the regroup runs inside the trace (weights are tiny).
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, C, self.features), jnp.float32)
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        if H % 2 or W % 2:  # odd sizes: plain strided conv
            return jax.lax.conv_general_dilated(
                x, w, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w4 = w8.reshape(4, 2, 4, 2, C, self.features) \
               .transpose(0, 2, 1, 3, 4, 5) \
               .reshape(4, 4, 4 * C, self.features)
        xs = x.reshape(B, H // 2, 2, W // 2, 2, C) \
              .transpose(0, 1, 3, 2, 4, 5) \
              .reshape(B, H // 2, W // 2, 4 * C)
        return jax.lax.conv_general_dilated(
            xs, w4, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _FoldStemConv(nn.Module):
    """conv1 emitting the W-folded (F=2) layout DIRECTLY from the conv.

    The fold64 encoder's `fold(conv1(x), 2)` reshape sits at a conv-output
    layout boundary: XLA lays conv outputs {3,0,2,1} (batch second-minor),
    so the "free" (W, C)-contiguous reshape is a real HBM relayout there
    (PERF.md HLO byte anatomy). Emitting folded columns straight from the
    stem removes the boundary: fold slot p of folded output col j is the
    original stride-2 output col 2j+p, i.e.

        out[i, j, p*64+co] = sum_{ky,kx} w[ky, kx, ci, co]
                                         x[2i+ky-3, 4j + (kx+2p) - 3, ci]

    — one conv with stride (2, 4), W padding (3, 2), and a (7, 9, C, 128)
    kernel holding w at [ky, kx+2p, ci, p*64+co] (zeros elsewhere; 9/7 MAC
    inflation on the tiny stem). Param name/shape/init match nn.Conv's
    (7, 7, C, 64) exactly, so checkpoints and torch import are unchanged.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import numpy as np

        B, H, W, C = x.shape
        assert H % 2 == 0 and W % 4 == 0, (H, W)
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, C, self.features), jnp.float32)
        ind = np.zeros((7, 2, 9), np.float32)
        for kx in range(7):
            for p in range(2):
                ind[kx, p, kx + 2 * p] = 1.0
        ind = jnp.asarray(ind, w.dtype)
        # w9[ky, kx', ci, p*F + co] = w[ky, kx'-2p, ci, co]
        w9 = jnp.einsum("ykcb,kpx->yxcpb", w, ind)
        w9 = w9.reshape(7, 9, C, 2 * self.features).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w9, (2, 4), ((3, 3), (3, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


from fusiondepth_tpu.ops.pooling import max_pool_3x3s2  # noqa: E402
# (re-exported here for probes/tests; implementation + custom VJP live in
# ops/pooling.py — see its docstring for the TPU layout rationale)


def pack2(x):
    """(2n, H, W, C) -> (n, H, W, 2C): adjacent batch pairs side by side in
    the channel (lane) dim — out[i, ..., j*C + c] = x[2i + j, ..., c].

    Rationale (measured, scripts/exp_convnet.py convg2_64 vs conv64): the
    encoder's C=64 region fills half of every 128-lane tile; packing two
    samples makes the lanes dense, and XLA lowers feature_group_count=2
    convs at full density (1.8x faster grads), unlike g>=4 (which it
    scalarizes to ~1% MFU — the decoder keeps W-folding instead)."""
    B, H, W, C = x.shape
    return x.reshape(B // 2, 2, H, W, C).transpose(0, 2, 3, 1, 4) \
            .reshape(B // 2, H, W, 2 * C)


def unpack2(x):
    """Inverse of pack2."""
    Bh, H, W, C2 = x.shape
    C = C2 // 2
    return x.reshape(Bh, H, W, 2, C).transpose(0, 3, 1, 2, 4) \
            .reshape(2 * Bh, H, W, C)


class _FoldConv3x3(nn.Module):
    """3x3 stride-1 ZERO-pad conv on a W-folded (B, H, Wf, F*Cin) input
    with nn.Conv's exact param name/shape/init — the (3, 3, Cin, Cout)
    kernel is expanded to the folded band form inside the trace
    (ops/folded.fold_kernel3x3, weights are tiny), so checkpoints and
    torch import are unchanged. Zero padding needs only one folded column
    per side: the band kernel reads dx in [-1, 1], so only the nearest
    original column of the pad is touched (with zero weight beyond)."""

    features: int
    in_features: int
    F: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xf):
        from fusiondepth_tpu.ops.folded import fold_kernel3x3

        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_features, self.features), jnp.float32)
        kf = fold_kernel3x3(k, self.F).astype(self.dtype)
        # padding lives INSIDE the conv: an explicit jnp.pad materializes
        # (and layout-copies) the whole padded tensor in HLO
        return jax.lax.conv_general_dilated(
            xf, kf, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _RawKernel3x3(nn.Module):
    """Parameter-compatible stand-in for _FoldConv3x3 (same param
    name/shape/init) used by the fused Pallas encoder path, which applies
    the weights itself (ops/pallas_fold_conv.fold_conv3x3_zero_pallas)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, self.in_features, self.features),
                          jnp.float32)


class _FoldBridgeConv3x3(nn.Module):
    """3x3 stride-(2,2) conv CONSUMING a W-folded (F=2) input — the
    layer2 downsample entry. Original out col b taps orig cols
    2b-1, 2b, 2b+1 = folded col b-1 (slot 1) and folded col b (slots
    0, 1), so the folded kernel is (3, 2, 2*Cin, Cout) applied at
    stride (2, 1) with one zero folded column of left pad (zero-pad
    semantics preserved: orig col -1 is the zero pad). Output is the
    ordinary dense (B, H/2, W_orig/2, Cout) tensor — the fold ends here.
    Param name/shape/init match nn.Conv exactly."""

    features: int
    in_features: int  # ORIGINAL (unfolded) input channels
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xf):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_features, self.features), jnp.float32)
        z = jnp.zeros_like(w[:, 0])                       # (3, Cin, Cout)
        tap0 = jnp.concatenate([z, w[:, 0]], axis=1)      # col b-1: slot 1
        tap1 = jnp.concatenate([w[:, 1], w[:, 2]], axis=1)  # col b: s0, s1
        kf = jnp.stack([tap0, tap1], axis=1).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            xf, kf, (2, 1), ((1, 1), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _FoldBridge1x1(nn.Module):
    """1x1 stride-(2,2) conv consuming a W-folded (F=2) input — the
    layer2 downsample shortcut. Orig out col b = orig col 2b = folded
    col b slot 0: a (1, 1, 2*Cin, Cout) kernel with zeros on slot 1,
    stride (2, 1). Param name/shape/init match nn.Conv exactly."""

    features: int
    in_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xf):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.in_features, self.features), jnp.float32)
        kf = jnp.concatenate([w, jnp.zeros_like(w)], axis=2).astype(
            self.dtype)
        return jax.lax.conv_general_dilated(
            xf, kf, (2, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _PairConv3x3(nn.Module):
    """3x3 stride-1 conv applied per pack slot (feature_group_count=2) with
    nn.Conv's exact param name/shape/init — the same (3,3,Cin,Cout) kernel
    serves both slots, so checkpoints and torch import are unchanged."""

    features: int
    in_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_features, self.features), jnp.float32)
        k2 = jnp.concatenate([k, k], axis=-1).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x, k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=2)


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    packed: bool = False  # input is pack2-packed (2 samples in lanes)
    folded: bool = False  # input is W-folded at F=2 (ops/folded.fold)
    fold_in: bool = False  # stride-2 entry CONSUMING a folded input
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.fold_in:
            # layer2's downsample entry fed the still-folded layer1 output:
            # the bridge convs read whole folded columns (no stride-2 W
            # slicing of a half-lane tensor) and emit the ordinary dense
            # layout. Math identical to the generic path.
            assert self.stride == 2
            cin = x.shape[-1] // 2
            norm = lambda name: BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name)
            y = _FoldBridgeConv3x3(self.features, cin,
                                   dtype=self.dtype, name="conv1")(x)
            y = nn.relu(norm("bn1")(y))
            y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name="conv2")(y)
            y = norm("bn2")(y)
            identity = _FoldBridge1x1(self.features, cin, dtype=self.dtype,
                                      name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
            return nn.relu(y + identity)
        if self.folded:
            # W-folded basic block: convs run on dense 128-lane tiles via
            # the band kernel; BN stats tied across the two fold slots
            # equal the unfolded per-channel stats exactly (the slots ARE
            # the even/odd W positions of the same channel). Everything
            # else (relu, residual) is elementwise and layout-agnostic.
            assert self.stride == 1 and x.shape[-1] == 2 * self.features
            norm = lambda name: BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                pack=2, dtype=self.dtype, name=name)
            menc = pallas_fold_conv.mode_enc()
            db = jnp.dtype(self.dtype).itemsize
            if menc != "0" and pallas_fold_conv.eligible_enc(
                    x.shape, 2, db_in=db, db_out=db):
                # fused Pallas path: conv1 raw, then bn1's affine + relu
                # fused INTO conv2's input side (the activated tensor
                # never hits HBM); bn2 affine + residual + relu is one
                # XLA elementwise fusion. Identical params/stats/math.
                itp = menc == "interpret"
                feat = self.features
                w1 = _RawKernel3x3(feat, feat, name="conv1")()
                w2 = _RawKernel3x3(feat, feat, name="conv2")()
                dummy = jnp.ones((2 * feat,), self.dtype)
                c1 = pallas_fold_conv.fold_conv3x3_zero_pallas(
                    x, w1, dummy, dummy, 2, feat, False, itp)
                a1, b1 = norm("bn1")(c1, return_affine=True)
                c2 = pallas_fold_conv.fold_conv3x3_zero_pallas(
                    c1, w2, a1, b1, 2, feat, True, itp)
                a2, b2 = norm("bn2")(c2, return_affine=True)
                return nn.relu(c2 * a2 + b2 + x)
            y = _FoldConv3x3(self.features, self.features,
                             dtype=self.dtype, name="conv1")(x)
            y = nn.relu(norm("bn1")(y))
            y = _FoldConv3x3(self.features, self.features,
                             dtype=self.dtype, name="conv2")(y)
            y = norm("bn2")(y)
            return nn.relu(y + x)
        if self.packed:
            assert self.stride == 1 and x.shape[-1] == 2 * self.features
            norm = lambda name: BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                pack=2, dtype=self.dtype, name=name)
            y = _PairConv3x3(self.features, self.features,
                             dtype=self.dtype, name="conv1")(x)
            y = nn.relu(norm("bn1")(y))
            y = _PairConv3x3(self.features, self.features,
                             dtype=self.dtype, name="conv2")(y)
            y = norm("bn2")(y)
            return nn.relu(y + x)
        norm = lambda name: BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if identity.shape[-1] != self.features or self.stride != 1:
            identity = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class _Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        out_ch = self.features * 4
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm("bn3")(y)
        if identity.shape[-1] != out_ch or self.stride != 1:
            identity = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(y + identity)


class ResnetEncoder(nn.Module):
    """5-level ResNet feature pyramid over an NHWC image.

    Args:
      depth: 18/34/50/101/152.
      in_channels: first-conv input channels (see module docstring).
      normalize_input: apply (x - 0.45) / 0.225 (on for RGB paths; the
        reference applies it to every encoder input, including 2-channel
        LiDAR — resnet_encoder.py:94 — so default True).
      dtype: compute dtype (bfloat16 for TPU speed; params stay fp32).
    """

    depth: int = 18
    in_channels: int = 3
    normalize_input: bool = True
    s2d_stem: bool = False
    # batch-pair packing for the C=64 region (bn1/relu/pool/layer1): two
    # samples side by side in the lanes, convs as feature_group_count=2 —
    # dense 128-lane tiles, exact same math (see pack2's docstring).
    # Applies when the batch is even and the depth uses _BasicBlock.
    pack2: bool = False
    # W-fold the C=64 region (bn1/relu/pool/layer1) at F=2: view
    # (B, H, W, 64) as (B, H, W/2, 128) — dense 128-lane tiles with ZERO
    # transposes (the fold is a free reshape in (W, C)-contiguous order,
    # unlike pack2's batch<->lane regroups). Convs use the band kernel
    # (ops/folded.fold_kernel3x3, 2x the MACs — trivial at these sizes);
    # BN stats tied across fold slots equal the unfolded stats exactly.
    fold64: bool = False
    # emit the stem conv's output directly in the F=2 folded layout
    # (_FoldStemConv) instead of fold()ing after — removes the conv-output
    # layout boundary under the fold reshape. Only with fold64.
    fold_stem: bool = False
    # return pyramid levels 0 (stem relu) and 1 (layer1) STILL FOLDED at
    # F=2 — shapes (B, H/2, W/4, 128) / (B, H/4, W/8, 128) — for a folded
    # decoder that consumes them via DepthDecoder.skip_fold=2, eliding the
    # unfold/refold reshape pair at the seam (each a real HBM relayout
    # under the {3,0,2,1} conv output layout). Requires the fold64 path to
    # actually engage at trace time (asserted).
    folded_features: bool = False
    truncate_at: Optional[int] = None  # perf-probe: stop after N stages
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        stages = RESNET_STAGES[self.depth]
        bottleneck = self.depth > 34
        block = _Bottleneck if bottleneck else _BasicBlock
        stop = self.truncate_at

        if self.normalize_input:
            x = (x - 0.45) / 0.225
        x = x.astype(self.dtype)
        if stop == 0:
            return [x]

        features = []
        use_pack = (self.pack2 and not bottleneck and x.shape[0] % 2 == 0)
        use_fold = (self.fold64 and not use_pack and not bottleneck
                    and x.shape[2] % 4 == 0)
        use_fold_stem = (use_fold and self.fold_stem and not self.s2d_stem
                         and x.shape[1] % 2 == 0)
        if self.folded_features:
            assert use_fold, (
                "folded_features requires the fold64 path to engage "
                f"(fold64={self.fold64} pack={use_pack} "
                f"bottleneck={bottleneck} W={x.shape[2]})")
        yf = None
        if use_fold_stem:
            yf = _FoldStemConv(64, dtype=self.dtype, name="conv1")(x)
            if stop == 1:
                from fusiondepth_tpu.ops.folded import unfold

                return [unfold(yf, 64)]
        elif self.s2d_stem:
            y = _S2DStemConv(64, dtype=self.dtype, name="conv1")(x)
        else:
            y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        if yf is None and stop == 1:
            return [y]

        if use_fold:
            from fusiondepth_tpu.ops.folded import fold, unfold

            if yf is None:
                yf = fold(y, 2)
            yf = BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, pack=2, dtype=self.dtype,
                           name="bn1")(yf)
            yf = nn.relu(yf)
            features.append(yf if self.folded_features else unfold(yf, 64))
            if stop == 2:
                return features
            # the pool's never-stride-W formulation is already fold-shaped
            # internally; unfold/fold around it are free reshapes
            p = max_pool_3x3s2(unfold(yf, 64))
            if stop == 3:
                return features + [p]
            pf = fold(p, 2)
            for block_i in range(stages[0]):
                pf = _BasicBlock(64, 1, folded=True, dtype=self.dtype,
                                 name=f"layer1_{block_i}")(pf, train)
            features.append(pf if self.folded_features else unfold(pf, 64))
            if stop == 4:
                return features
            # layer2's stride-2 entry consumes the STILL-FOLDED layer1
            # output via bridge convs (no stride-2 W slicing at C=64)
            y = _BasicBlock(128, 2, fold_in=True, dtype=self.dtype,
                            name="layer2_0")(pf, train)
            for block_i in range(1, stages[1]):
                y = _BasicBlock(128, 1, dtype=self.dtype,
                                name=f"layer2_{block_i}")(y, train)
            features.append(y)
            if stop == 5:
                return features
        elif use_pack:
            yp = pack2(y)
            yp = BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, pack=2, dtype=self.dtype,
                           name="bn1")(yp)
            yp = nn.relu(yp)
            features.append(unpack2(yp))
            if stop == 2:
                return features
            yp = max_pool_3x3s2(yp)
            if stop == 3:
                return features + [unpack2(yp)]
            for block_i in range(stages[0]):
                yp = _BasicBlock(64, 1, packed=True, dtype=self.dtype,
                                 name=f"layer1_{block_i}")(yp, train)
            y = unpack2(yp)
            features.append(y)
            if stop == 4:
                return features
        else:
            y = BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
            y = nn.relu(y)
            features.append(y)
            if stop == 2:
                return features

            y = max_pool_3x3s2(y)
            if stop == 3:
                return features + [y]

        widths = (64, 128, 256, 512)
        for stage_i, (w, n_blocks) in enumerate(zip(widths, stages)):
            if (use_pack and stage_i == 0) or (use_fold and stage_i <= 1):
                continue  # layer1 (and folded layer2) ran above
            for block_i in range(n_blocks):
                stride = 2 if (stage_i > 0 and block_i == 0) else 1
                y = block(w, stride, dtype=self.dtype,
                          name=f"layer{stage_i + 1}_{block_i}")(y, train)
            features.append(y)
            if stop == 4 + stage_i:
                return features

        return features
