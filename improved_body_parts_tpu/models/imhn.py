"""TPU-native IMHN (Identity-Mapping Hourglass Network) in Flax.

Re-designed from the reference architecture (models/posenet.py:50-144,
models/layers_transposed.py:12-310) for TPU:

  * NHWC layout end-to-end (XLA's native conv layout on TPU — the reference
    permutes NHWC inputs to NCHW for cuDNN, models/posenet.py:92).
  * bf16 compute policy with fp32 parameters and fp32 BatchNorm statistics
    (replaces apex AMP O1 dynamic loss scaling, train_distributed.py:135-138 —
    bf16 on TPU needs no loss scaling).
  * Cross-replica (sync) BatchNorm via ``axis_name`` on the data mesh axis
    (replaces apex ``convert_syncbn_model``, train_distributed.py:89-96).
  * The 4-level hourglass recursion is unrolled at trace time (static Python
    recursion -> one fused XLA graph; no dynamic control flow).

Architecture parity map (all shapes NHWC):
  Backbone   : 7x7/s2 conv(3->64) -> Residual(64->128) -> maxpool ->
               Residual(128->128) -> 6 dilated 3x3 convs (d=3,3,4,4,5,5) ->
               concat(128+128) = 256ch @ H/4      (layers_transposed.py:160-196)
  Hourglass  : depth 4, widths 256/384/512/640/768, returns 5 scales
               (layers_transposed.py:199-286)
  Features   : per scale Conv3x3 -> Conv3x3 -> SE(r=16)   (posenet.py:25-47)
  Heads      : per scale 1x1 conv -> 50ch                 (posenet.py:79)
  Identity-mapping merges: per-scale merge_preds(pred) + merge_features(feat)
               added to next stack's hourglass outputs; scale-0 cache also
               added to the stack input                  (posenet.py:94-122)
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from improved_body_parts_tpu.configs import ModelConfig

# Reference init: conv kernels ~ N(0, 0.001), SE linear ~ N(0, 0.01)
# (models/posenet.py:124-144).
conv_init = nn.initializers.normal(stddev=0.001)
dense_init = nn.initializers.normal(stddev=0.01)

LEAKY_SLOPE = 0.01


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


class ConvBlock(nn.Module):
    """conv -> [BN] -> [LeakyReLU]; bias only when BN is off.

    reference: models/layers_transposed.py:90-157 (``Conv``/``DilatedConv``).

    ``quant`` selects the post-training-quantization inference modes
    (models/quantize.py; BN must already be folded into the conv):
      * ``"calib"``: fp forward on the folded weights, sowing the input
        abs-max into the ``quant_calib`` collection (activation-scale
        calibration pass).
      * ``"int8"``: s8 x s8 -> s32 conv on the MXU (per-output-channel
        weight scales, per-tensor activation scale), dequantize + bias in
        fp32. TPU v5e runs int8 matmul/conv at 2x the bf16 MXU rate.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    bn: bool = True
    relu: bool = True
    dilation: int = 1
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel - 1) // 2
        if self.quant == "int8":
            kshape = (self.kernel, self.kernel, x.shape[-1], self.features)
            kernel_q = self.param("kernel_q", nn.initializers.zeros, kshape,
                                  jnp.int8)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            w_scale = self.param("w_scale", nn.initializers.ones,
                                 (self.features,), jnp.float32)
            a_scale = self.param("a_scale", nn.initializers.ones,
                                 (), jnp.float32)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kernel_q,
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            x = (y.astype(jnp.float32) * (a_scale * w_scale)
                 + bias).astype(self.dtype)
            return leaky_relu(x) if self.relu else x
        if self.quant == "calib":
            self.sow("quant_calib", "absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     init_fn=lambda: jnp.zeros(()), reduce_fn=jnp.maximum)
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            # quant modes run on BN-folded weights: bias carries the BN shift
            use_bias=(not self.bn) or self.quant is not None,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=conv_init,
            name="conv",
        )(x)
        if self.bn and self.quant is None:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,            # torch momentum 0.1 == flax decay 0.9
                epsilon=1e-5,
                dtype=jnp.float32,       # keep BN math in fp32
                axis_name=self.axis_name if train else None,
                name="bn",
            )(x)
            x = x.astype(self.dtype)
        if self.relu:
            x = leaky_relu(x)
        return x


class Residual(nn.Module):
    """Bottleneck residual: 1x1 -> 3x3 -> 1x1 with BN, LeakyReLU, identity skip.

    reference: models/layers_transposed.py:12-48.
    """
    features: int
    relu: bool = True
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.features // 2
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, quant=self.quant)
        h = ConvBlock(mid, kernel=1, name="conv1", **kw)(x, train)
        h = ConvBlock(mid, kernel=3, name="conv2", **kw)(h, train)
        h = ConvBlock(self.features, kernel=1, relu=False, name="conv3", **kw)(h, train)
        if x.shape[-1] != self.features:
            x = ConvBlock(self.features, kernel=1, relu=False, name="skip", **kw)(x, train)
        out = h + x
        return leaky_relu(out) if self.relu else out


class SELayer(nn.Module):
    """Squeeze-and-excitation channel attention. reference: layers_transposed.py:289-310."""
    reduction: int = 16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (N, C) global avg pool
        y = nn.Dense(c // self.reduction, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=dense_init, name="fc1")(y.astype(self.dtype))
        y = leaky_relu(y)
        y = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=dense_init, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def upsample_nearest2(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbour upsample (reference: nn.Upsample mode='nearest')."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class Backbone(nn.Module):
    """Dilated stem producing ``out_dim`` channels @ stride 4.

    At the default out_dim=256 this matches the reference widths exactly
    (64 -> 128 -> 128 dilated x6 -> concat 256, layers_transposed.py:160-196);
    smaller widths are used for fast tests.
    """
    out_dim: int = 256
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, quant=self.quant)
        half = self.out_dim // 2
        x = ConvBlock(self.out_dim // 4, kernel=7, stride=2, name="conv1", **kw)(x, train)
        x = Residual(half, name="res1", **kw)(x, train)
        x = max_pool2(x)
        x = Residual(half, name="res2", **kw)(x, train)
        h = x
        for i, d in enumerate((3, 3, 4, 4, 5, 5)):
            h = ConvBlock(half, kernel=3, dilation=d, name=f"dilated{i}", **kw)(h, train)
        return jnp.concatenate([x, h], axis=-1)  # out_dim channels


class Hourglass(nn.Module):
    """Recursive 4-level hourglass returning 5 feature scales.

    Output: [c@H, c+i@H/2, c+2i@H/4, c+3i@H/8, c+4i@H/16] where c=nfeat, i=increase.
    reference: models/layers_transposed.py:199-286.
    """
    depth: int = 4
    nfeat: int = 256
    increase: int = 128
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, quant=self.quant)
        down_feats: List[jnp.ndarray] = []

        def level(d: int, h: jnp.ndarray) -> jnp.ndarray:
            c = self.nfeat + self.increase * d
            c_next = c + self.increase
            up1 = Residual(c, name=f"d{d}_up1", **kw)(h, train)
            low = max_pool2(h)
            low = Residual(c_next, name=f"d{d}_low1", **kw)(low, train)
            if d == self.depth - 1:
                low2 = Residual(c_next, name=f"d{d}_inner", **kw)(low, train)
            else:
                low2 = level(d + 1, low)
            down_feats.append(low2)  # innermost appended first
            low3 = Residual(c, name=f"d{d}_low2", **kw)(low2, train)
            up2 = upsample_nearest2(low3)
            up2 = ConvBlock(c, kernel=3, name=f"d{d}_refine", **kw)(up2, train)
            return up1 + up2

        top = level(0, x)
        # [top@H] + reversed(down_feats) = scales H, H/2, H/4, H/8, H/16
        return [top] + down_feats[::-1]


class Features(nn.Module):
    """Per-scale regression trunk: Conv3x3 -> Conv3x3 -> SE. reference: posenet.py:25-47."""
    inp_dim: int = 256
    se_reduction: int = 16
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, fms: Sequence[jnp.ndarray], train: bool = False):
        assert len(fms) == 5
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, quant=self.quant)
        outs = []
        for s, f in enumerate(fms):
            h = ConvBlock(self.inp_dim, kernel=3, name=f"s{s}_conv1", **kw)(f, train)
            h = ConvBlock(self.inp_dim, kernel=3, name=f"s{s}_conv2", **kw)(h, train)
            h = SELayer(self.se_reduction, dtype=self.dtype, name=f"s{s}_se")(h)
            outs.append(h)
        return outs


class PoseNet(nn.Module):
    """4-stack IMHN. Input NHWC image in [0,1]; output [nstack][5] NHWC 50ch maps.

    reference: models/posenet.py:50-122.
    """
    cfg: ModelConfig = ModelConfig()
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        kw = dict(dtype=self.dtype, axis_name=self.axis_name, quant=self.quant)
        # rematerialize each hourglass in the backward pass to fit larger
        # batches in HBM (jax.checkpoint; TPU memory/FLOPs trade).
        # MEASURED round 2: extending remat to Backbone+Features as well
        # lets bs16 fit but collapses throughput (46 s/step at bs8 — XLA
        # recompute-storms/spills); hourglass-only is the right cut.
        HG = (nn.remat(Hourglass, static_argnums=(2,)) if cfg.remat
              else Hourglass)
        x = Backbone(out_dim=cfg.inp_dim, name="pre", **kw)(imgs.astype(self.dtype), train)

        preds: List[List[jnp.ndarray]] = []
        feat_caches: List[Optional[jnp.ndarray]] = [None] * cfg.num_scales
        for t in range(cfg.nstack):
            hg_outs = HG(depth=cfg.depth, nfeat=cfg.inp_dim,
                         increase=cfg.increase, name=f"hg{t}", **kw)(x, train)
            if cfg.extra_attention:
                # per-scale channel attention on hourglass outputs
                # (reference posenet_final.py variant)
                hg_outs = [SELayer(cfg.se_reduction, dtype=self.dtype,
                                   name=f"chattn{t}_s{s}")(h)
                           for s, h in enumerate(hg_outs)]
            if cfg.cross_stack and t > 0:
                hg_outs = [hg_outs[s] + feat_caches[s] for s in range(cfg.num_scales)]
            feats = Features(inp_dim=cfg.inp_dim, se_reduction=cfg.se_reduction,
                             name=f"features{t}", **kw)(hg_outs, train)
            stack_preds: List[jnp.ndarray] = []
            for s in range(cfg.num_scales):
                pred = ConvBlock(cfg.oup_dim, kernel=1, bn=False, relu=False,
                                 dtype=self.dtype, quant=self.quant,
                                 name=f"out{t}_s{s}")(feats[s], train)
                stack_preds.append(pred)
                if cfg.cross_stack and t != cfg.nstack - 1:
                    c = cfg.inp_dim + s * cfg.increase
                    cache = (
                        ConvBlock(c, kernel=1, relu=False,
                                  name=f"merge_pred{t}_s{s}", **kw)(pred, train)
                        + ConvBlock(c, kernel=1, relu=False,
                                    name=f"merge_feat{t}_s{s}", **kw)(feats[s], train)
                    )
                    if s == 0:
                        x = x + cache
                    feat_caches[s] = cache
            preds.append(stack_preds)
        # fp32 outputs for the loss / post-processing
        return [[p.astype(jnp.float32) for p in stack] for stack in preds]


class LegacyHourglass(nn.Module):
    """The OLD (AE-style) hourglass: plain 3x3 conv blocks instead of
    residuals and NO post-upsample refine conv (up2 = upsample(low3)
    directly). reference: models/layers.py:97-169.
    """
    depth: int = 4
    nfeat: int = 256
    increase: int = 128
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        down_feats: List[jnp.ndarray] = []

        def level(d: int, h: jnp.ndarray) -> jnp.ndarray:
            c = self.nfeat + self.increase * d
            c_next = c + self.increase
            up1 = ConvBlock(c, kernel=3, name=f"d{d}_up1", **kw)(h, train)
            low = max_pool2(h)
            low = ConvBlock(c_next, kernel=3, name=f"d{d}_low1", **kw)(low, train)
            if d == self.depth - 1:
                low2 = ConvBlock(c_next, kernel=3, name=f"d{d}_inner", **kw)(low, train)
            else:
                low2 = level(d + 1, low)
            down_feats.append(low2)
            low3 = ConvBlock(c, kernel=3, name=f"d{d}_low2", **kw)(low2, train)
            return up1 + upsample_nearest2(low3)

        top = level(0, x)
        return [top] + down_feats[::-1]


class IndependentPoseNet(nn.Module):
    """The AE-family ablation network (models/posenet_independent.py:39-96):
    plain-conv stem (no dilation), LegacyHourglass, per-scale-width
    Features WITHOUT squeeze-excitation, and NO per-scale cross-stack
    skips — only the scale-0 merge feeds the next stack's input. (The
    reference inits this family's convs N(0, 0.01),
    posenet_independent.py:99-106; we keep the live library's N(0, 0.001)
    — a training-dynamics-only difference in a from-scratch ablation.)"""
    cfg: ModelConfig = ModelConfig()
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, imgs: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        x = imgs.astype(self.dtype)
        # stem: Conv7/s2 -> Conv3 -> pool -> Conv3 -> Conv3 (:52-58)
        x = ConvBlock(64, kernel=7, stride=2, name="pre0", **kw)(x, train)
        x = ConvBlock(128, kernel=3, name="pre1", **kw)(x, train)
        x = max_pool2(x)
        x = ConvBlock(128, kernel=3, name="pre2", **kw)(x, train)
        x = ConvBlock(cfg.inp_dim, kernel=3, name="pre3", **kw)(x, train)

        preds: List[List[jnp.ndarray]] = []
        for t in range(cfg.nstack):
            hg_outs = LegacyHourglass(depth=cfg.depth, nfeat=cfg.inp_dim,
                                      increase=cfg.increase,
                                      name=f"hg{t}", **kw)(x, train)
            stack_preds: List[jnp.ndarray] = []
            for s in range(cfg.num_scales):
                c = cfg.inp_dim + s * cfg.increase
                f = ConvBlock(c, kernel=3, name=f"feat{t}_s{s}a", **kw)(
                    hg_outs[s], train)
                f = ConvBlock(c, kernel=3, name=f"feat{t}_s{s}b", **kw)(f, train)
                pred = ConvBlock(cfg.oup_dim, kernel=1, bn=False, relu=False,
                                 dtype=self.dtype,
                                 name=f"out{t}_s{s}")(f, train)
                stack_preds.append(pred)
                if t != cfg.nstack - 1 and s == 0:
                    # only the top scale chains into the next stack (:89-92)
                    x = (x
                         + ConvBlock(c, kernel=1, bn=False, relu=False,
                                     dtype=self.dtype,
                                     name=f"merge_pred{t}")(pred, train)
                         + ConvBlock(c, kernel=1, bn=False, relu=False,
                                     dtype=self.dtype,
                                     name=f"merge_feat{t}")(f, train))
            preds.append(stack_preds)
        return [[p.astype(jnp.float32) for p in stack] for stack in preds]


def create_model(cfg: ModelConfig = ModelConfig(), dtype: Any = jnp.bfloat16,
                 axis_name: Optional[str] = None,
                 quant: Optional[str] = None) -> nn.Module:
    if cfg.legacy_blocks:
        assert quant is None, "quantization supports the live PoseNet only"
        return IndependentPoseNet(cfg=cfg, dtype=dtype, axis_name=axis_name)
    return PoseNet(cfg=cfg, dtype=dtype, axis_name=axis_name, quant=quant)


def init_model(model: PoseNet, rng: jax.Array, height: int = 512, width: int = 512):
    """Initialize variables with a dummy batch; returns (params, batch_stats)."""
    dummy = jnp.zeros((1, height, width, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return variables["params"], variables["batch_stats"]


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
