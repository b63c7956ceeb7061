"""Shared conv building blocks (NHWC) for the adapter / FAPM / U-Net decoder.

Norm and nonlinearity choices come from plans.json architecture strings
(resolved via dinounet_tpu.utilities.registry.resolve_op_name), mirroring how
the reference instantiates torch ops from plans
(ref: dinounet_training.py:668-694, dynamic_network_architectures StackedConvBlocks).

BatchNorm under pjit/GSPMD normalizes over the logically-global batch, so the
reference's SyncBatchNorm (ref: dinov3_adapter.py:361-364) comes for free.
"""

import functools
import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# kaiming_normal with fan_out/relu gain, matching the reference's conv init
# (ref: dinov3_adapter.py:380-385 normal(0, sqrt(2/fan_out)))
conv_kaiming_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def nonlin_fn(name: str, kwargs: Optional[dict] = None) -> Callable:
    kwargs = kwargs or {}
    if name == "leaky_relu":
        slope = kwargs.get("negative_slope", 0.01)
        # NOTE: rewriting as jnp.maximum(x, slope*x) to fuse away the decoder's
        # standalone 1.6 ms select_n pass was measured SLOWER end-to-end
        # (139.0 -> 135.9 p/s, BASELINE.md round 2) — the select pass
        # apparently overlaps/fuses better than the max. Keep flax's form.
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if name == "relu":
        return nn.relu
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "none":
        return lambda x: x
    raise KeyError(f"Unknown nonlinearity {name}")


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True, track_running_stats=False) equivalent, NHWC.

    Stateless (no running stats) => jit-friendly; normalizes over H, W per
    (sample, channel), fp32 math.

    param_dim: declare scale/bias at this (logical) width even when x is
    channel-padded wider (the decoder's wide inference mode); the padded
    channels normalize to exactly 0 (zero mean/var, zero-padded affine).
    """
    eps: float = 1e-5
    param_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = self.param_dim or x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        if dim != x.shape[-1]:
            pad = (0, x.shape[-1] - dim)
            scale = jnp.pad(scale, pad)
            bias = jnp.pad(bias, pad)
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        # one-pass statistics (see LayerNormFp32): E[x] and E[x^2] in one read
        mean = xf.mean(axes, keepdims=True)
        mean2 = (xf * xf).mean(axes, keepdims=True)
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class Norm(nn.Module):
    """Dispatch on a semantic norm name ('instancenorm' | 'batchnorm' | 'none')."""
    kind: str
    eps: float = 1e-5
    momentum: float = 0.9
    param_dim: Optional[int] = None  # logical width when x is channel-padded

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "instancenorm":
            return InstanceNorm(self.eps, param_dim=self.param_dim,
                                name="norm")(x)
        if self.kind == "batchnorm":
            return nn.BatchNorm(
                use_running_average=not train, momentum=self.momentum,
                epsilon=self.eps, dtype=jnp.float32, name="norm",
            )(x)
        if self.kind == "none":
            return x
        raise KeyError(f"Unknown norm kind {self.kind}")


class _ConvInnerParams(nn.Module):
    """nn.Conv-identical param tree (kernel (kh, kw, Cin, Cout) + bias) for
    paths that apply the convolution manually (the wide inference mode)."""
    features: int
    kernel_size: Tuple[int, int]
    use_bias: bool

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", conv_kaiming_init,
                       (*self.kernel_size, in_features, self.features),
                       jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
        else:
            b = jnp.zeros((self.features,), jnp.float32)
        return k, b


class ConvNormAct(nn.Module):
    """conv -> [dropout] -> norm -> nonlin (nnU-Net ConvDropoutNormReLU order)."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    norm: str = "instancenorm"
    norm_kwargs: Optional[dict] = None
    nonlin: str = "leaky_relu"
    nonlin_kwargs: Optional[dict] = None
    conv_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, wide: bool = False,
                 logical_in: Optional[int] = None):
        nk = self.norm_kwargs or {}
        if wide and not train:
            return self._wide(x, logical_in or x.shape[-1], nk)
        x = nn.Conv(
            self.features, self.kernel_size, strides=self.strides, padding="SAME",
            use_bias=self.conv_bias, dtype=self.dtype, kernel_init=conv_kaiming_init,
            name="conv",
        )(x)
        x = Norm(self.norm, eps=nk.get("eps", 1e-5), name="norm")(x, train=train)
        return nonlin_fn(self.nonlin, self.nonlin_kwargs)(x)

    def _wide(self, x, logical_in: int, nk: dict, lanes: int = 128):
        """Full-lane variant: identical params, output channel-padded to
        `lanes` with exact zeros (see configuration.decoder_wide_convs).
        `logical_in` is the input's true channel count; any padded input
        channels beyond it multiply zero-padded kernel rows."""
        k, b = _ConvInnerParams(self.features, self.kernel_size,
                                self.conv_bias, name="conv")(logical_in)
        wide_out = max(lanes, self.features)
        k = jnp.pad(k.astype(self.dtype),
                    ((0, 0),) * len(self.kernel_size)
                    + ((0, x.shape[-1] - logical_in),
                       (0, wide_out - self.features)))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, self.strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.pad(b, (0, wide_out - self.features)).astype(self.dtype)
        y = Norm(self.norm, eps=nk.get("eps", 1e-5),
                 param_dim=self.features, name="norm")(y, train=False)
        return nonlin_fn(self.nonlin, self.nonlin_kwargs)(y)


class StackedConvBlocks(nn.Module):
    """n ConvNormAct blocks; first maps in->out channels, the rest out->out.

    Parity with dynamic_network_architectures.StackedConvBlocks as used by the
    decoder (ref: dinounet_training.py:581-592).
    """
    n_convs: int
    features: int
    kernel_size: Tuple[int, int]
    norm: str
    norm_kwargs: Optional[dict]
    nonlin: str
    nonlin_kwargs: Optional[dict]
    conv_bias: bool
    dtype: jnp.dtype = jnp.bfloat16
    initial_strides: Optional[Tuple[int, ...]] = None  # default: all-1, kernel rank

    @nn.compact
    def __call__(self, x, train: bool = False, wide: bool = False):
        # wide inference mode (configuration.decoder_wide_convs): only for
        # 2-D instancenorm stages below the 128-lane tile width; the output
        # stays channel-padded to 128 (exact zeros), consumers pad weights
        wide = (wide and not train and self.features < 128
                and len(self.kernel_size) == 2
                and self.norm == "instancenorm")
        logical_in = x.shape[-1]
        for i in range(self.n_convs):
            x = ConvNormAct(
                self.features, self.kernel_size,
                strides=(self.initial_strides
                         if i == 0 and self.initial_strides is not None
                         else (1,) * len(self.kernel_size)),
                norm=self.norm, norm_kwargs=self.norm_kwargs,
                nonlin=self.nonlin, nonlin_kwargs=self.nonlin_kwargs,
                conv_bias=self.conv_bias, dtype=self.dtype, name=f"conv{i}",
            )(x, train=train, wide=wide, logical_in=logical_in)
            logical_in = self.features
        return x


class SqueezeExcitation(nn.Module):
    """SE block (ref: dinounet_training.py:210-225)."""
    reduction: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        reduced = max(1, ch // self.reduction)
        w = x.astype(jnp.float32).mean(axis=(1, 2), keepdims=True).astype(x.dtype)
        w = nn.Conv(reduced, (1, 1), use_bias=True, dtype=self.dtype, name="fc1")(w)
        w = nn.relu(w)
        w = nn.Conv(ch, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(w)
        return x * nn.sigmoid(w)


class DepthwiseSeparableConv(nn.Module):
    """depthwise 3x3 -> pointwise 1x1 -> norm -> act (ref: dinounet_training.py:228-246)."""
    features: int
    norm: str = "instancenorm"
    norm_kwargs: Optional[dict] = None
    nonlin: str = "leaky_relu"
    nonlin_kwargs: Optional[dict] = None
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch, (3, 3), padding="SAME", feature_group_count=in_ch,
            use_bias=self.use_bias, dtype=self.dtype, kernel_init=conv_kaiming_init,
            name="depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=conv_kaiming_init, name="pointwise",
        )(x)
        x = Norm(self.norm, name="norm")(x, train=train)
        return nonlin_fn(self.nonlin, self.nonlin_kwargs)(x)


def _phase_transpconv2x2(x, k, b):
    """ConvTranspose(kernel=stride=2) as two phase matmuls + free reshapes:
    out[b, 2h+dy, 2w+dx, co] = sum_ci x[b,h,w,ci]*k[1-dy,1-dx,ci,co] + b[co]
    (lax.conv_transpose(transpose_kernel=False) correlates with the kernel
    spatially flipped — probed on this backend).

    Each output phase is an independent 1x1 projection of the input, so the
    op is two (Ci, 2*Co) matmuls (columns dx-major, making the (w, dx) merge
    a plain reshape) and an interleave of adjacent dims — MXU-friendly M/K/N
    where XLA's conv_transpose lowering runs well off the HBM floor on the
    model's 2x2/s2 upsamplers (round-3 trace: encoder up0 1.24 ms,
    adapter up 0.96, decoder transpconv2 1.05)."""
    B, H, W, Ci = x.shape
    Co = k.shape[-1]
    rows = []
    for dy in (0, 1):
        kd = jnp.concatenate([k[1 - dy, 1], k[1 - dy, 0]], axis=-1)  # (Ci, 2*Co)
        r = jnp.einsum("bhwi,io->bhwo", x, kd)
        rows.append(r.reshape(B, H, 2 * W, Co))
    return jnp.stack(rows, axis=2).reshape(B, 2 * H, 2 * W, Co) + b


def _use_phase_transpconv() -> bool:
    """DINOUNET_TPU_TRANSPCONV_IMPL in {"conv", "phase"}: formulation of the
    2x2/stride-2 transposed convs (identical params/math; see
    _phase_transpconv2x2)."""
    return os.environ.get("DINOUNET_TPU_TRANSPCONV_IMPL", "conv") == "phase"


class TransposedConv(nn.Module):
    """ConvTranspose2d(kernel=stride) equivalent: exact x2 (or sxs) upsampling.

    `logical_in` (call-time): the input's true channel count when x arrives
    channel-padded from a wide-mode stage — the kernel is declared at the
    logical width (identical param tree) and zero-padded rows consume the
    padding channels."""
    features: int
    stride: Tuple[int, int] = (2, 2)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, logical_in: Optional[int] = None):
        if (logical_in is None and tuple(self.stride) == (2, 2)
                and _use_phase_transpconv()):
            k, b = _TranspConvInnerParams(self.features, self.use_bias,
                                          name="transpconv")(x.shape[-1])
            return _phase_transpconv2x2(
                x.astype(self.dtype), k.astype(self.dtype),
                b.astype(self.dtype))
        if logical_in is not None and logical_in != x.shape[-1]:
            k, b = _TranspConvInnerParams(self.features, self.use_bias,
                                          name="transpconv")(logical_in)
            k = jnp.pad(k.astype(self.dtype),
                        ((0, 0), (0, 0), (0, x.shape[-1] - logical_in), (0, 0)))
            y = jax.lax.conv_transpose(
                x.astype(self.dtype), k, self.stride, "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.use_bias:
                y = y + b.astype(self.dtype)
            return y
        return nn.ConvTranspose(
            self.features, kernel_size=self.stride, strides=self.stride,
            padding="VALID", use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=conv_kaiming_init, name="transpconv",
        )(x)


class _TranspConvInnerParams(nn.Module):
    """nn.ConvTranspose-identical param tree (kernel (2, 2, Cin, Cout) + bias)."""
    features: int
    use_bias: bool

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", conv_kaiming_init,
                       (2, 2, in_features, self.features), jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
        else:
            b = jnp.zeros((self.features,), jnp.float32)
        return k, b


class TransposedConvParams(nn.Module):
    """Mirrors TransposedConv's param tree (transpconv/{kernel, bias}) for
    paths whose matmul runs inside a Pallas kernel
    (ops/decoder_tail_pallas.py::transpconv2x2_cm)."""
    features: int
    use_bias: bool

    @nn.compact
    def __call__(self, in_features: int):
        return _TranspConvInnerParams(self.features, self.use_bias,
                                      name="transpconv")(in_features)


@functools.lru_cache(maxsize=None)
def _resize_matrix(src: int, dst: int, antialias: bool = False):
    """One axis of a bilinear resize as a dense (dst, src) numpy matrix
    (pure numpy: safe to call during tracing).

    antialias=False matches torch F.interpolate(mode='bilinear',
    align_corners=False) — the reference's resize everywhere (e.g.
    dinov3_adapter.py:471-474) — including plain 2-tap downscaling;
    antialias=True matches jax.image.resize's triangle-kernel downscaling.
    Sizes are static under jit, so resizes become two small matmuls on the
    MXU instead of the gather-based lowering.
    """
    scale = src / dst
    kernel_scale = max(scale, 1.0) if antialias else 1.0
    out = np.zeros((dst, src), np.float32)
    for i in range(dst):
        center = (i + 0.5) * scale - 0.5
        lo = int(np.floor(center - kernel_scale))
        hi = int(np.ceil(center + kernel_scale))
        js = np.arange(lo, hi + 1)
        w = np.maximum(0.0, 1.0 - np.abs(js - center) / kernel_scale)
        valid = (js >= 0) & (js < src)
        total = w.sum()
        if total > 0:
            np.add.at(out[i], np.clip(js[valid], 0, src - 1), w[valid] / total)
            # edge handling: weights of out-of-range taps are dropped and the
            # remainder renormalized (jax.image.resize behavior)
            kept = out[i].sum()
            if kept > 0:
                out[i] /= kept
    return out


def _phase_axis_resize(y, axis: int, dst: int, ct):
    """Integer-ratio bilinear resize along `axis` as per-phase 2-tap lerps.

    For integer up/down ratios every `_resize_matrix` row has at most two
    nonzero taps, so the resize is s interleaved elementwise lerps instead of
    a K=src matmul — XLA emits one fused VPU pass at the HBM floor where the
    einsum form runs ~3x over it (round-3 trace: the wW einsums cost 1.05 ms
    vs a 0.31 ms floor). The tap weights are rounded to the compute dtype
    like the matrix cast, both paths form the two products and their sum in
    f32, and the result is rounded once — bitwise-identical to the einsum
    path for bf16 inputs (the in-model dtype; the 2-tap f32 arithmetic on
    bf16 values is exact), within 1 ulp for f32 inputs (the einsum's dot may
    FMA where this path rounds each product) and for non-dyadic integer
    ratios (edge renormalization vs replicate-pad when w0+w1 rounds off
    1)."""
    src = y.shape[axis]

    def axslice(arr, start, length):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(start, start + length)
        return arr[tuple(idx)]

    yf = y.astype(jnp.float32)
    if dst % src == 0:  # integer upscale
        s = dst // src
        first = axslice(yf, 0, 1)
        last = axslice(yf, src - 1, 1)
        ypad = jnp.concatenate([first, yf, last], axis=axis)  # edge replicate
        phases = []
        for p in range(s):
            center = (p + 0.5) / s - 0.5
            d0 = int(np.floor(center))
            # round the weights like the matrix cast (numpy: jnp would stage
            # a tracer under jit)
            w1 = float(np.asarray(center - d0, np.dtype(ct)))
            w0 = float(np.asarray(1.0 - (center - d0), np.dtype(ct)))
            a = axslice(ypad, 1 + d0, src)
            b = axslice(ypad, 2 + d0, src)
            phases.append(a * w0 + b * w1)
        out = jnp.stack(phases, axis=axis + 1)  # (..., src, s, ...)
        new_shape = list(y.shape)
        new_shape[axis] = src * s
        return out.reshape(new_shape).astype(ct)
    # integer downscale (non-antialias: always <=2 taps, both in-group)
    s = src // dst
    gshape = list(y.shape)
    gshape[axis:axis + 1] = [dst, s]
    g = yf.reshape(gshape)

    def gslice(k):
        idx = [slice(None)] * len(gshape)
        idx[axis + 1] = k
        return g[tuple(idx)]

    if s % 2 == 1:
        out = gslice(s // 2)
    else:
        out = gslice(s // 2 - 1) * 0.5 + gslice(s // 2) * 0.5
    return out.astype(ct)


def _resize_emit_bhcw() -> bool:
    """DINOUNET_TPU_RESIZE_EMIT in {"bhwc", "bhcw"}: output-dim order of the
    W-axis resize einsum. The env var is read per trace — under jax.jit the
    branch is baked in at trace time, so toggling in-process only takes
    effect after clearing jit caches (the A/B harness runs each setting in
    its own subprocess). See the inline comment in bilinear_resize; default
    set by the round-3 hardware A/B."""
    return os.environ.get("DINOUNET_TPU_RESIZE_EMIT", "bhwc") == "bhcw"


def _use_phase_resize() -> bool:
    """DINOUNET_TPU_RESIZE_IMPL in {"matmul", "phase"}: formulation of the
    integer-ratio bilinear resizes (the adapter's add_vit_feature 4x/2x/0.5x
    maps). Fractional ratios always take the matmul path."""
    return os.environ.get("DINOUNET_TPU_RESIZE_IMPL", "matmul") == "phase"


def _resize_w_first() -> bool:
    """DINOUNET_TPU_RESIZE_ORDER in {"hw", "wh"}: axis order of the two
    resize contractions. "hw" (default) resizes H first then W — the W
    contraction runs on the already-H-resized (large) map and the round-4/5
    traces show a 0.62 ms relayout copy on its operand at the x1 (4x) scale.
    "wh" contracts W first at the small source H, making the H contraction
    (a contraction over a major dim in the {3,0,2,1} layouts) the one that
    writes the large map. The separable lerps commute; outputs agree up to
    the bf16 rounding of the intermediate (exact in the f32 parity path)."""
    return os.environ.get("DINOUNET_TPU_RESIZE_ORDER", "hw") == "wh"


def bilinear_resize(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize NHWC, matching F.interpolate(align_corners=False,
    antialias=False), as two matmuls (or phase-decomposed lerps for integer
    ratios — see _phase_axis_resize).

    bf16 inputs stream through the MXU in bf16 (f32 accumulation inside the
    matmul): these resizes sit on 100+ MB activation maps where an fp32
    intermediate doubles the HBM traffic. fp32 inputs keep full fp32 math
    (the parity-test path)."""
    B, H, W, C = x.shape
    if (H, W) == tuple(size):
        return x
    ct = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    phase = _use_phase_resize()

    def resize_h(y):
        if size[0] == H:
            return y
        if phase and (size[0] % H == 0 or H % size[0] == 0):
            return _phase_axis_resize(y, 1, size[0], ct)
        return jnp.einsum("hH,bHwc->bhwc",
                          jnp.asarray(_resize_matrix(H, size[0]), ct), y)

    def resize_w(y):
        if size[1] == W:
            return y
        if phase and (size[1] % W == 0 or W % size[1] == 0):
            return _phase_axis_resize(y, 2, size[1], ct)
        if _resize_emit_bhcw():
            # Emit the W contraction with the new w minor-adjacent to c and
            # transpose back logically: XLA's layout assignment can then hand
            # the consumer (the adapter's transpconv add-fusion reads x1 with
            # W in lanes, round-3 trace) the dot output without the standalone
            # 0.62 ms relayout copy it pays on the bhwc emit. Same contraction,
            # same f32 accumulate, bit-identical values.
            y = jnp.einsum("wW,bhWc->bhcw",
                           jnp.asarray(_resize_matrix(W, size[1]), ct), y)
            return jnp.swapaxes(y, 2, 3)
        return jnp.einsum("wW,bhWc->bhwc",
                          jnp.asarray(_resize_matrix(W, size[1]), ct), y)

    y = x.astype(ct)
    if _resize_w_first():
        y = resize_h(resize_w(y))
    else:
        y = resize_w(resize_h(y))
    return y.astype(x.dtype)


class LearnableUpsample(nn.Module):
    """Repeated shared 2x transposed conv to >= target, then bilinear to exact size.

    ref: dinounet_training.py:249-264. The number of doublings is static given the
    (static) input/target sizes, so this unrolls cleanly under jit.

    At inference with the fused decoder tail enabled, the doublings run
    channel-major through ops/decoder_tail_pallas.py::transpconv2x2_cm
    (M=4*ch matmul shapes vs XLA's 25%-lane emitter at the high-res steps);
    the NHWC boundary transposes cancel against the decoder chain's entry
    transposes XLA-side. Param tree is identical either way (shared
    checkpoints)."""
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, target_size: Tuple[int, int], train: bool = False):
        ch = x.shape[-1]
        h, w = x.shape[1], x.shape[2]
        doublings = []
        while h * 2 <= target_size[0] and w * 2 <= target_size[1]:
            doublings.append((h, w))
            h, w = h * 2, w * 2

        if doublings and self._use_cm(x, doublings, train):
            from dinounet_tpu.configuration import decoder_tail_impl
            from dinounet_tpu.ops.decoder_tail_pallas import transpconv2x2_cm

            interp = decoder_tail_impl() == "interpret"
            k, b = TransposedConvParams(ch, True, name="up2")(ch)
            y = jnp.transpose(x, (0, 3, 1, 2))
            for _ in doublings:
                y = transpconv2x2_cm(y, k, b, interpret=interp)
            x = jnp.transpose(y, (0, 2, 3, 1))
        else:
            up2 = TransposedConv(ch, (2, 2), use_bias=True, dtype=self.dtype,
                                 name="up2")
            for _ in doublings:
                x = up2(x)
        if (x.shape[1], x.shape[2]) != tuple(target_size):
            x = bilinear_resize(x, target_size)
        return x

    def _use_cm(self, x, doublings, train) -> bool:
        if train or x.ndim != 4 or x.dtype != jnp.bfloat16:
            return False
        from dinounet_tpu.configuration import use_fused_decoder_tail

        if not use_fused_decoder_tail():
            return False
        from dinounet_tpu.ops.decoder_tail_pallas import _pick_stripe

        return all(_pick_stripe(h, vmem_rows=16) is not None
                   for h, _ in doublings)
