"""nnU-Net-style conv U-Net decoder with deep-supervision heads.

Capability parity with ref: dinounet_training.py:517-629 (UNetDecoder): per stage
transpconv(below) -> concat(skip) -> StackedConvBlocks -> 1x1 seg head; all DS
heads are always built (so checkpoints load regardless of the DS flag); returns
the list of seg outputs (highest resolution first) when deep supervision is on,
else the top output.
"""

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dinounet_tpu.models.layers import (StackedConvBlocks, TransposedConv,
                                        conv_kaiming_init, nonlin_fn)


class _ConvParams(nn.Module):
    """nn.Conv-identical param tree (kernel/bias) for the fused tail path."""
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


class _InstanceNormParams(nn.Module):
    """InstanceNorm-identical param tree (scale/bias)."""
    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        return scale, bias


class _NormParams(nn.Module):
    """Mirrors layers.Norm('instancenorm') -> InstanceNorm(name='norm')."""
    @nn.compact
    def __call__(self, features: int):
        return _InstanceNormParams(name="norm")(features)


class _ConvNormActParams(nn.Module):
    """Mirrors layers.ConvNormAct's param tree (conv + norm/norm)."""
    features: int
    kernel_size: Tuple[int, int]
    conv_bias: bool

    @nn.compact
    def __call__(self, in_features: int):
        k, b = _ConvParams(self.features, self.kernel_size, self.conv_bias,
                           name="conv")(in_features)
        g, be = _NormParams(name="norm")(self.features)
        return k, b, g, be


class _StageParams(nn.Module):
    """Mirrors StackedConvBlocks(n_convs=2)'s param tree (conv0, conv1)."""
    features: int
    kernel_size: Tuple[int, int]
    conv_bias: bool

    @nn.compact
    def __call__(self, in_features: int):
        p0 = _ConvNormActParams(self.features, self.kernel_size,
                                self.conv_bias, name="conv0")(in_features)
        p1 = _ConvNormActParams(self.features, self.kernel_size,
                                self.conv_bias, name="conv1")(self.features)
        return p0, p1


from dinounet_tpu.models.layers import TransposedConvParams as _TranspParams


class _SegParams(nn.Module):
    """SegHead-identical param tree (kernel (1,..,1,C,K) + bias)."""
    num_classes: int
    rank: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1,) * self.rank + (in_features, self.num_classes), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_classes,), jnp.float32)
        return kernel.reshape(in_features, self.num_classes), bias


class SegHead(nn.Module):
    """1x1(x1) conv to num_classes with fp32 logits.

    Param layout is identical to nn.Conv (kernel (1,..,1,C,K) + bias), so
    checkpoints are unchanged. bf16 feature maps are contracted directly in
    bf16 (f32 MXU accumulation) instead of first materializing an fp32 copy
    of the highest-resolution decoder tensor; fp32 inputs use full fp32 math.
    """
    num_classes: int
    rank: int  # spatial rank (2 or 3)
    dtype: jnp.dtype = jnp.bfloat16
    in_features: Optional[int] = None  # logical C when x is channel-padded

    @nn.compact
    def __call__(self, x, prefer_reduce: bool = False):
        C = self.in_features or x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1,) * self.rank + (C, self.num_classes), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_classes,), jnp.float32)
        w = kernel.reshape(C, self.num_classes)
        if C != x.shape[-1]:  # wide-mode input: padded channels are zeros
            w = jnp.pad(w, ((0, x.shape[-1] - C), (0, 0)))
        if x.dtype == jnp.bfloat16:
            from dinounet_tpu.configuration import seg_head_impl, seg_head_reduce

            if prefer_reduce and self.num_classes <= 8 and seg_head_reduce():
                # broadcast-multiply + reduce instead of dot_general: a dot
                # operand cannot absorb elementwise producers, a reduce
                # input can — XLA fuses the stage's InstanceNorm-apply +
                # leaky into this pass (see configuration.seg_head_reduce)
                y = jnp.sum(
                    x.astype(jnp.float32)[..., None]
                    * w[(None,) * (x.ndim - 1)], axis=-2)
            elif (prefer_reduce and seg_head_impl() in ("conv", "convw",
                                                        "convbf")
                  and x.ndim == self.rank + 2):
                # real 1x1 convolution instead of dot_general: a convolution
                # operand CAN absorb elementwise producers, so XLA fuses the
                # stage's InstanceNorm-apply + leaky into this op's input
                # and the standalone full-map activation pass disappears
                # (see configuration.seg_head_impl). A 1x1 conv is pointwise,
                # so the dimension labels are arbitrary: "convw" declares the
                # minor spatial dim (W) as the conv's batch — the TPU emitter
                # puts the conv batch in output lanes, so this yields the
                # same small W-in-lanes logits layout the dot form gets
                # (f32 {2,3,1,0:T(4,128)}, 33 MB) instead of the 537 MB
                # batch-in-lanes (B=8 -> 128 pad) write "conv" produced in
                # the round-4 trace.
                kernel4 = w.astype(jnp.bfloat16).reshape(
                    (1,) * self.rank + w.shape)
                if seg_head_impl() == "convw":
                    n = x.ndim
                    dn = jax.lax.ConvDimensionNumbers(
                        # batch = the minor spatial dim, feature = channels,
                        # everything else a size-preserved spatial dim
                        lhs_spec=(n - 2, n - 1) + tuple(range(n - 2)),
                        rhs_spec=(n - 1, n - 2) + tuple(range(n - 2)),
                        out_spec=(n - 2, n - 1) + tuple(range(n - 2)),
                    )
                    y = jax.lax.conv_general_dilated(
                        x, kernel4, window_strides=(1,) * (x.ndim - 2),
                        padding="VALID", dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                else:
                    # "convbf" keeps the absorbing NHWC form but writes bf16:
                    # the absorbed variant's cost in the round-4 trace was
                    # its 537 MB f32 batch-in-lanes output — bf16 halves it,
                    # and the canonicalizing copy upcasts to the f32 logits
                    # contract
                    out_t = (jnp.bfloat16 if seg_head_impl() == "convbf"
                             else jnp.float32)
                    spatial = "DHW"[-self.rank:]
                    y = jax.lax.conv_general_dilated(
                        x, kernel4, window_strides=(1,) * self.rank,
                        padding="VALID",
                        dimension_numbers=(f"N{spatial}C", f"{spatial}IO",
                                           f"N{spatial}C"),
                        preferred_element_type=out_t,
                    ).astype(jnp.float32)
            else:
                y = jax.lax.dot_general(
                    x, w.astype(jnp.bfloat16),
                    (((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            y = jnp.einsum("...c,ck->...k", x.astype(jnp.float32), w)
        return y + bias


class UNetDecoder(nn.Module):
    encoder_channels: Sequence[int]  # per stage, stage 0 = highest resolution
    encoder_strides: Sequence[Tuple[int, int]]
    encoder_kernel_sizes: Sequence[Tuple[int, int]]
    num_classes: int
    n_conv_per_stage: Sequence[int]
    deep_supervision: bool = False
    norm: str = "instancenorm"
    norm_kwargs: Optional[dict] = None
    nonlin: str = "leaky_relu"
    nonlin_kwargs: Optional[dict] = None
    conv_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, skips: List[jnp.ndarray], train: bool = False):
        n_stages = len(self.encoder_channels)
        assert len(skips) == n_stages
        assert len(self.n_conv_per_stage) == n_stages - 1

        from dinounet_tpu.configuration import decoder_wide_convs

        wide = decoder_wide_convs() and not train
        lres = skips[-1]
        lres_logical = lres.shape[-1]
        seg_outputs = []
        for s in range(1, n_stages):
            skip_ch = self.encoder_channels[-(s + 1)]
            stride = tuple(self.encoder_strides[-s])
            skip = skips[-(s + 1)]
            if self._use_fused_chain(s, n_stages, skips, train):
                seg_outputs.extend(self._fused_chain(s, n_stages, lres, skips))
                break
            x = TransposedConv(
                skip_ch, stride, use_bias=self.conv_bias, dtype=self.dtype,
                name=f"transpconv{s - 1}",
            )(lres, logical_in=lres_logical)
            if self._use_hwbc(s, x, skip, train):
                x = self._hwbc_stage(s, x, skip)
            elif self._use_split_concat(s, wide):
                x = self._split_concat_stage(s, x, skip)
            else:
                x = jnp.concatenate([x, skip], axis=-1)
                x = StackedConvBlocks(
                    n_convs=self.n_conv_per_stage[s - 1], features=skip_ch,
                    kernel_size=tuple(self.encoder_kernel_sizes[-(s + 1)]),
                    norm=self.norm, norm_kwargs=self.norm_kwargs,
                    nonlin=self.nonlin, nonlin_kwargs=self.nonlin_kwargs,
                    conv_bias=self.conv_bias, dtype=self.dtype,
                    name=f"stage{s - 1}",
                )(x, train=train, wide=wide)
            # seg heads are always constructed (checkpoint compat, ref :594-597);
            # fp32 logits for a stable loss. In bf16 mode the input feature map
            # streams in bf16 with f32 accumulation — pre-casting the full-res
            # map to fp32 materializes a 2x-sized copy of the largest decoder
            # tensor just to feed a 1x1 conv.
            seg = SegHead(
                self.num_classes, rank=len(stride), dtype=self.dtype,
                in_features=skip_ch, name=f"seg{s - 1}",
            )(x, prefer_reduce=not train)
            seg_outputs.append(seg)
            lres = x
            lres_logical = skip_ch

        seg_outputs = seg_outputs[::-1]  # highest resolution first
        if self.deep_supervision:
            return seg_outputs
        return seg_outputs[0]

    def _use_split_concat(self, s, wide) -> bool:
        """conv0(concat(up, skip)) as two input-channel-sliced convs summed —
        the 2C concat map never materializes (configuration.
        decoder_concat_impl; the round-5 train trace showed the concat
        cluster + backward split at ~5.4 ms of the dinounet_s step)."""
        if wide or self.n_conv_per_stage[s - 1] != 2:
            return False
        if self.norm != "instancenorm" or self.nonlin != "leaky_relu":
            return False
        from dinounet_tpu.configuration import decoder_concat_impl

        return decoder_concat_impl() == "split"

    def _split_concat_stage(self, s, x_up, skip):
        """StackedConvBlocks(n_convs=2) semantics with conv0's kernel sliced
        over its input channels instead of concatenating the inputs: rows
        [:C_up] consume the transpconv output, rows [C_up:] the skip (the ref
        concat order, dinounet_training.py:601-612). Identical param tree
        (stage{s-1}/conv{i}/{conv,norm/norm}) via _StageParams, identical
        ConvNormAct math: bf16 conv + bias, f32 InstanceNorm, leaky."""
        skip_ch = self.encoder_channels[-(s + 1)]
        ks = tuple(self.encoder_kernel_sizes[-(s + 1)])
        p0, p1 = _StageParams(skip_ch, ks, self.conv_bias,
                              name=f"stage{s - 1}")(x_up.shape[-1]
                                                    + skip.shape[-1])
        k0, b0, g0, be0 = p0
        k1, b1, g1, be1 = p1
        nk = self.norm_kwargs or {}
        nlk = self.nonlin_kwargs or {}
        eps = nk.get("eps", 1e-5)
        leaky = nonlin_fn(self.nonlin, nlk)
        rank = len(ks)
        dt = self.dtype

        def conv(v, k, b=None):
            y = jax.lax.conv_general_dilated(
                v.astype(dt), k.astype(dt), (1,) * rank, "SAME",
                dimension_numbers=(("NHWC", "HWIO", "NHWC") if rank == 2
                                   else ("NDHWC", "DHWIO", "NDHWC")))
            return y if b is None else y + b.astype(dt)

        def inorm(v, g, be):
            vf = v.astype(jnp.float32)
            axes = tuple(range(1, v.ndim - 1))
            mean = vf.mean(axes, keepdims=True)
            mean2 = (vf * vf).mean(axes, keepdims=True)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            y = (vf - mean) * jax.lax.rsqrt(var + eps)
            return (y * g + be).astype(v.dtype)

        cu = x_up.shape[-1]
        y = conv(x_up, k0[..., :cu, :]) + conv(skip, k0[..., cu:, :])
        if self.conv_bias:
            y = y + b0.astype(dt)
        y = leaky(inorm(y, g0, be0))
        y = conv(y, k1, b1 if self.conv_bias else None)
        return leaky(inorm(y, g1, be1))

    def _use_hwbc(self, s, x_t, skip, train) -> bool:
        """Native-layout Pallas stage convs (ops/conv_hwbc_pallas.py,
        configuration.decoder_hwbc): inference-only, sub-128-channel 2-D
        instancenorm+leaky stages with supported shapes — the class XLA's
        batch-in-sublanes emitter runs at <=12.5% MXU."""
        if train or self.norm != "instancenorm" or self.nonlin != "leaky_relu":
            return False
        if self.n_conv_per_stage[s - 1] != 2:
            return False
        if tuple(self.encoder_kernel_sizes[-(s + 1)]) != (3, 3):
            return False
        if x_t.ndim != 4 or x_t.dtype != jnp.bfloat16 or x_t.shape != skip.shape:
            return False
        if self.encoder_channels[-(s + 1)] >= 128:
            return False  # full-lane stages: XLA's emitter is fine there
        from dinounet_tpu.configuration import decoder_hwbc
        from dinounet_tpu.ops.conv_hwbc_pallas import hwbc_supported

        mode = decoder_hwbc()
        if mode == "jax":
            return False
        if mode == "auto" and jax.default_backend() != "tpu":
            return False
        return hwbc_supported(tuple(x_t.shape))

    def _hwbc_stage(self, s, x_t, skip):
        """conv0(concat) + IN + leaky + conv1 + IN + leaky through the
        native-layout kernels. Declares the exact StackedConvBlocks param
        tree (stage{s-1}/conv{i}/{conv,norm/norm}) so checkpoints are
        shared; the transposes into/out of the (H, W, B, C) views are
        layout bitcasts of the NHWC {3,0,2,1} buffers (round-4 trace)."""
        from dinounet_tpu.configuration import decoder_hwbc
        from dinounet_tpu.ops.conv_hwbc_pallas import (
            conv3x3_hwbc, instance_norm_prologue_params)

        interp = decoder_hwbc() == "interpret"
        skip_ch = self.encoder_channels[-(s + 1)]
        ks = tuple(self.encoder_kernel_sizes[-(s + 1)])
        p0, p1 = _StageParams(skip_ch, ks, self.conv_bias,
                              name=f"stage{s - 1}")(2 * skip_ch)
        k0, b0, g0, be0 = p0
        k1, b1, g1, be1 = p1
        nk = self.norm_kwargs or {}
        nlk = self.nonlin_kwargs or {}
        eps = nk.get("eps", 1e-5)
        slope = nlk.get("negative_slope", 0.01)

        B, H, W, _ = x_t.shape
        n = H * W
        xv = jnp.transpose(x_t, (1, 2, 0, 3))   # layout bitcast
        sv = jnp.transpose(skip, (1, 2, 0, 3))
        # ref concat order is [transpconv_out, skip] (dinounet_training.py
        # :601-612): conv0's kernel rows are consumed in that order
        y0, s0, q0 = conv3x3_hwbc(xv, k0, b0, x2=sv, interpret=interp)
        sc0, sh0 = instance_norm_prologue_params(s0, q0, n, g0, be0, eps)
        y1, s1, q1 = conv3x3_hwbc(y0, k1, b1, prologue=(sc0, sh0),
                                  leaky_slope=slope, interpret=interp)
        sc1, sh1 = instance_norm_prologue_params(s1, q1, n, g1, be1, eps)
        # final apply+leaky stays XLA-side: its consumer (seg head conv /
        # next transpconv) absorbs the elementwise producer for free
        yf = y1.astype(jnp.float32) * sc1[None, None] + sh1[None, None]
        yl = jnp.where(yf >= 0, yf, yf * slope).astype(x_t.dtype)
        return jnp.transpose(yl, (2, 0, 1, 3))  # layout bitcast back

    def _use_fused_chain(self, s, n_stages, skips, train) -> bool:
        """The fused channel-major chain (ops/decoder_tail_pallas.py)
        replaces all remaining stages' transpconv + StackedConvBlocks + seg
        heads at inference when every one of them is eligible: XLA runs
        these high-resolution low-channel convs at ~12% MFU (sub-128 output
        channels), the Pallas chain at M=3*Cout / M=4*Cout matmul shapes
        with the InstanceNorm applies fused into the next kernel's prologue.
        Inference-only: training keeps the plain flax graph (and its XLA
        backward)."""
        if train or self.norm != "instancenorm" or self.nonlin != "leaky_relu":
            return False
        from dinounet_tpu.configuration import use_fused_decoder_tail

        if not use_fused_decoder_tail():
            return False
        from dinounet_tpu.ops.decoder_tail_pallas import (_pick_stripe,
                                                          tail_supported)

        for j in range(s, n_stages):
            if tuple(self.encoder_strides[-j]) != (2, 2):
                return False
            if self.n_conv_per_stage[j - 1] != 2:
                return False
            if tuple(self.encoder_kernel_sizes[-(j + 1)]) != (3, 3):
                return False
            skip = skips[-(j + 1)]
            if len(skip.shape) != 4:
                return False
            H, W = skip.shape[1], skip.shape[2]
            if not tail_supported((skip.shape[0], skip.shape[3], H, W)):
                return False
            if H % 2 or W % 2 or _pick_stripe(H // 2, vmem_rows=16) is None:
                return False
        return True

    def _fused_chain(self, s, n_stages, lres, skips):
        """Run stages s..n_stages-1 through the fused channel-major chain.
        Declares param trees identical to the flax modules it replaces
        (transpconv{j-1}, stage{j-1}/conv{i}/{conv,norm/norm}, seg{j-1}) so
        both paths share checkpoints. Returns one entry per stage in
        decoding order: NHWC fp32 logits where a head is computed (all
        stages under deep supervision, else the last), None elsewhere."""
        from dinounet_tpu.configuration import decoder_tail_impl
        from dinounet_tpu.ops.decoder_tail_pallas import decoder_chain_cm

        interp = decoder_tail_impl() == "interpret"
        stage_params, seg_params, skips_cm = [], [], []
        cin = lres.shape[-1]
        for j in range(s, n_stages):
            skip_ch = self.encoder_channels[-(j + 1)]
            ks = tuple(self.encoder_kernel_sizes[-(j + 1)])
            kt, bt = _TranspParams(skip_ch, self.conv_bias,
                                   name=f"transpconv{j - 1}")(cin)
            p0, p1 = _StageParams(skip_ch, ks, self.conv_bias,
                                  name=f"stage{j - 1}")(2 * skip_ch)
            seg_params.append(_SegParams(self.num_classes, rank=2,
                                         name=f"seg{j - 1}")(skip_ch))
            stage_params.append((kt, bt, *p0, *p1))
            skips_cm.append(jnp.transpose(skips[-(j + 1)], (0, 3, 1, 2)))
            cin = skip_ch

        nk = self.norm_kwargs or {}
        nlk = self.nonlin_kwargs or {}
        outs = decoder_chain_cm(
            jnp.transpose(lres, (0, 3, 1, 2)), skips_cm, stage_params,
            seg_params, self.deep_supervision,
            eps=nk.get("eps", 1e-5),
            slope=nlk.get("negative_slope", 0.01),
            interpret=interp)
        return [o if o is None else jnp.transpose(o, (0, 2, 3, 1))
                for o in outs]
