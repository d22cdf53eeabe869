"""U-Net depth decoder with the reference's fusion hooks.

Semantics match reference networks/depth_decoder.py:6-96:
- 5 up-stages; stage i: upconv0 -> nearest 2x upsample -> concat skip
  (encoder feature i-1, additively fused with beam features when given)
  [-> concat injected depth map at scales in `scales`] -> upconv1.
- All convs are reflect-pad 3x3 + ELU (layers.py:100-130).
- Sigmoid disparity head per scale; `tanh_head` for the offset variant;
  `cat2end` concatenates the 2-channel LiDAR before the scale-0 head;
  `deep` doubles every ConvBlock; `road`(+`catxy`) widens the skip concat
  by 3(+3) channels for the pseudo-3D refine input.

NHWC layout. All control flow is static (python-level on config), so one
jit trace covers the whole decoder.

`folded=True` runs the standard configuration (no road/cat2end/deep) in
the W-folded layout of ops/folded.py: the decoder's 16-64-channel stages
otherwise fill 12.5-50% of each 128-lane TPU tile, running 12x over their
byte roofline (measured; see ops/folded.py docstring). Parameters are
IDENTICAL between the two paths (same tree, same shapes, same init), and
outputs agree to dtype tolerance (tests/test_folded.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from fusiondepth_tpu.ops.folded import (
    conv3x3_folded,
    fold,
    fold_factor,
    refold,
    unfold,
    upsample2x_folded,
)
from fusiondepth_tpu.ops import pallas_fold_conv
from fusiondepth_tpu.ops.padding import reflect_pad_hw
from fusiondepth_tpu.ops.resize import upsample2x_nearest

NUM_CH_DEC = (16, 32, 64, 128, 256)


class _RawConv(nn.Module):
    """Parameter-compatible stand-in for nn.Conv (same names/shapes/init)
    used by the folded path, which applies the weights itself."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class ConvBlock(nn.Module):
    """Reflect-pad 3x3 conv + ELU (reference layers.py:100-130)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x=None, *, folded_inputs=None, in_ch=None,
                 fold_F=None):
        if folded_inputs is None:
            x = reflect_pad_hw(x, 1)
            x = nn.Conv(self.features, (3, 3), padding="VALID",
                        dtype=self.dtype, name="conv")(x)
            return nn.elu(x)
        kernel, bias = _RawConv(self.features, sum(in_ch), name="conv")()
        m = pallas_fold_conv.mode()
        if m != "0" and pallas_fold_conv.eligible(
                folded_inputs[0].shape, fold_F):
            splits = []
            o = 0
            for c in in_ch:
                splits.append(kernel[:, :, o:o + c])
                o += c
            return pallas_fold_conv.fold_conv3x3_pallas(
                tuple(folded_inputs), tuple(splits), bias, fold_F,
                tuple(in_ch), True, m == "interpret")
        splits = []
        o = 0
        for c in in_ch:
            splits.append(kernel[:, :, o:o + c].astype(self.dtype))
            o += c
        y = conv3x3_folded(folded_inputs, splits, bias=bias, F=fold_F)
        return nn.elu(y.astype(self.dtype))


class Conv3x3(nn.Module):
    """Reflect-pad 3x3 conv, no nonlinearity (disparity head)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x=None, *, folded_inputs=None, in_ch=None,
                 fold_F=None):
        if folded_inputs is None:
            x = reflect_pad_hw(x, 1)
            return nn.Conv(self.features, (3, 3), padding="VALID",
                           dtype=self.dtype, name="conv")(x)
        kernel, bias = _RawConv(self.features, sum(in_ch), name="conv")()
        m = pallas_fold_conv.mode()
        if m != "0" and pallas_fold_conv.eligible(
                folded_inputs[0].shape, fold_F):
            splits = []
            o = 0
            for c in in_ch:
                splits.append(kernel[:, :, o:o + c])
                o += c
            return pallas_fold_conv.fold_conv3x3_pallas(
                tuple(folded_inputs), tuple(splits), bias, fold_F,
                tuple(in_ch), False, m == "interpret")
        splits = []
        o = 0
        for c in in_ch:
            splits.append(kernel[:, :, o:o + c].astype(self.dtype))
            o += c
        y = conv3x3_folded(folded_inputs, splits, bias=bias, F=fold_F)
        return y.astype(self.dtype)


class DepthDecoder(nn.Module):
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    cat2end: bool = False
    road: bool = False
    catxy: bool = False
    deep: bool = False
    tanh_head: bool = False
    folded: bool = False
    # fold factor at which pyramid levels 0 and 1 ARRIVE (seam elision:
    # the fold64 encoder hands its C=64 features over still folded at
    # F=2, see ResnetEncoder.folded_features). The folded path consumes
    # them with at most one composing reshape; every other path unfolds
    # them first. Param tree is unchanged either way.
    skip_fold: int = 1
    # perf-probe: stop after finishing stage `probe_stop` (4..0); the
    # last folded feature is returned under ("probe_x", 0) so truncated
    # decoders remain differentiable end-to-end (scripts/exp_convnet.py)
    probe_stop: Optional[int] = None
    dtype: Any = jnp.float32

    def _block(self, features, name):
        if self.deep:
            # two stacked ConvBlocks: ch -> ch -> features
            class _Deep(nn.Module):
                features: int
                dtype: Any

                @nn.compact
                def __call__(inner, x):
                    x = ConvBlock(x.shape[-1], dtype=inner.dtype, name="a")(x)
                    return ConvBlock(inner.features, dtype=inner.dtype,
                                     name="b")(x)

            return _Deep(features, self.dtype, name=name)
        return ConvBlock(features, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(
        self,
        input_features: Sequence[jnp.ndarray],
        two_channel: Optional[jnp.ndarray] = None,
        beam_features: Optional[Sequence[jnp.ndarray]] = None,
        depth_maps: Optional[dict] = None,
    ):
        """input_features: 5-level NHWC pyramid (coarsest last).

        beam_features: same pyramid from the beam encoder, fused additively.
        depth_maps: {("disp", i): (B, Hi, Wi, 3[+3])} pseudo-3D injections
        (road mode). Returns {("disp", s): (B, Hs, Ws, C)} for s in scales.
        """
        if (self.folded and self.use_skips and not self.cat2end
                and self.road == (depth_maps is not None)):
            return self._folded_forward(input_features, beam_features,
                                        two_channel, depth_maps)

        if self.skip_fold > 1:
            # seam features arrive folded but this path runs unfolded
            sf = self.skip_fold
            input_features = [
                unfold(f, f.shape[-1] // sf) if i <= 1 else f
                for i, f in enumerate(input_features)]
            if beam_features is not None:
                beam_features = [
                    unfold(f, f.shape[-1] // sf) if i <= 1 else f
                    for i, f in enumerate(beam_features)]

        outputs = {}
        if beam_features is not None:
            x = input_features[-1] + beam_features[-1]
        else:
            x = input_features[-1]
        x = x.astype(self.dtype)

        for i in range(4, -1, -1):
            x = self._block(NUM_CH_DEC[i], name=f"upconv_{i}_0")(x)
            xs = [upsample2x_nearest(x)]
            if self.use_skips and i > 0:
                skip = input_features[i - 1]
                if beam_features is not None:
                    skip = skip + beam_features[i - 1]
                xs.append(skip.astype(self.dtype))
            if depth_maps is not None and i in self.scales and self.use_skips:
                xs.append(depth_maps[("disp", i)].astype(self.dtype))
            x = jnp.concatenate(xs, axis=-1)
            x = self._block(NUM_CH_DEC[i], name=f"upconv_{i}_1")(x)
            if i in self.scales:
                head_in = x
                if i == 0 and self.cat2end:
                    head_in = jnp.concatenate(
                        [x, two_channel.astype(self.dtype)], axis=-1)
                d = Conv3x3(self.num_output_channels, dtype=self.dtype,
                            name=f"dispconv_{i}")(head_in)
                if self.tanh_head:
                    outputs[("disp", i)] = jnp.tanh(d)
                else:
                    outputs[("disp", i)] = nn.sigmoid(d)
            if self.probe_stop is not None and i == self.probe_stop:
                outputs[("probe_x", 0)] = x
                return outputs

        return outputs

    def _fblock(self, features, name):
        """Folded-layout counterpart of _block: same param tree (deep ->
        {a, b} ConvBlocks), folded call convention."""
        if self.deep:
            class _DeepF(nn.Module):
                features: int
                dtype: Any

                @nn.compact
                def __call__(inner, *, folded_inputs, in_ch, fold_F):
                    tot = sum(in_ch)
                    y = ConvBlock(tot, dtype=inner.dtype, name="a")(
                        folded_inputs=folded_inputs, in_ch=in_ch,
                        fold_F=fold_F)
                    return ConvBlock(inner.features, dtype=inner.dtype,
                                     name="b")(
                        folded_inputs=[y], in_ch=[tot], fold_F=fold_F)

            return _DeepF(features, self.dtype, name=name)
        return ConvBlock(features, dtype=self.dtype, name=name)

    def _folded_forward(self, input_features, beam_features, two_channel,
                        depth_maps=None):
        """Same math as the generic path, in the W-folded layout; one
        refold (free reshape) after each upconv0 keeps every stage's lane
        occupancy at 100% where W divisibility allows. Covers the road
        (+catxy) pseudo-3D injections and the deep (doubled-ConvBlock)
        variant — the refine2d decoder's configuration — with the same
        parameter tree as the generic path."""
        del two_channel  # cat2end handled by the generic path
        outputs = {}

        def skip_at(i):
            s = input_features[i]
            if beam_features is not None:
                s = s + beam_features[i]
            return s.astype(self.dtype)

        def skip_folded(i, F):
            """Skip feature i folded at F, plus its ORIGINAL channel count
            (the kernel-split width). Seam levels (i <= 1 when skip_fold>1)
            arrive already folded: the elementwise beam fusion runs in the
            folded layout and reaching F is one composing reshape (a no-op
            at F == skip_fold, i.e. the layer1 skip)."""
            if i <= 1 and self.skip_fold > 1:
                s = input_features[i]
                if beam_features is not None:
                    s = s + beam_features[i]
                Co = s.shape[-1] // self.skip_fold
                return refold(s.astype(self.dtype), Co, F), Co
            s = skip_at(i)
            return fold(s, F), s.shape[-1]

        x = skip_at(4) if beam_features is not None else input_features[-1]
        x = x.astype(self.dtype)
        C = x.shape[-1]
        F = fold_factor(C, x.shape[2])
        xf = fold(x, F)

        for i in range(4, -1, -1):
            co = NUM_CH_DEC[i]
            xf = self._fblock(co, name=f"upconv_{i}_0")(
                folded_inputs=[xf], in_ch=[C], fold_F=F)
            C = co
            # refold to the densest F the (pre-upsample) width allows
            W_now = xf.shape[2] * F
            Fn = fold_factor(C, W_now)
            if Fn != F:
                xf = fold(unfold(xf, C), Fn)
                F = Fn
            xf = upsample2x_folded(xf, F, C)
            ins, chs = [xf], [C]
            if self.use_skips and i > 0:
                skf, skC = skip_folded(i - 1, F)
                ins.append(skf)
                chs.append(skC)
            if (depth_maps is not None and i in self.scales
                    and self.use_skips):
                dm = depth_maps[("disp", i)].astype(self.dtype)
                ins.append(fold(dm, F))
                chs.append(dm.shape[-1])
            xf = self._fblock(co, name=f"upconv_{i}_1")(
                folded_inputs=ins, in_ch=chs, fold_F=F)
            C = co
            if i in self.scales:
                d = Conv3x3(self.num_output_channels, dtype=self.dtype,
                            name=f"dispconv_{i}")(
                    folded_inputs=[xf], in_ch=[C], fold_F=F)
                d = unfold(d, self.num_output_channels)
                if self.tanh_head:
                    outputs[("disp", i)] = jnp.tanh(d)
                else:
                    outputs[("disp", i)] = nn.sigmoid(d)
            if self.probe_stop is not None and i == self.probe_stop:
                outputs[("probe_x", 0)] = xf
                return outputs

        return outputs
