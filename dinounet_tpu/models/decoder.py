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

from dinounet_tpu.models.layers import StackedConvBlocks, TransposedConv


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

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1,) * self.rank + (C, self.num_classes), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_classes,), jnp.float32)
        w = kernel.reshape(C, self.num_classes)
        if x.dtype == jnp.bfloat16:
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

        lres = skips[-1]
        seg_outputs = []
        for s in range(1, n_stages):
            skip_ch = self.encoder_channels[-(s + 1)]
            stride = tuple(self.encoder_strides[-s])
            x = TransposedConv(
                skip_ch, stride, use_bias=self.conv_bias, dtype=self.dtype,
                name=f"transpconv{s - 1}",
            )(lres)
            x = jnp.concatenate([x, skips[-(s + 1)]], axis=-1)
            x = StackedConvBlocks(
                n_convs=self.n_conv_per_stage[s - 1], features=skip_ch,
                kernel_size=tuple(self.encoder_kernel_sizes[-(s + 1)]),
                norm=self.norm, norm_kwargs=self.norm_kwargs,
                nonlin=self.nonlin, nonlin_kwargs=self.nonlin_kwargs,
                conv_bias=self.conv_bias, dtype=self.dtype, name=f"stage{s - 1}",
            )(x, train=train)
            # seg heads are always constructed (checkpoint compat, ref :594-597);
            # fp32 logits for a stable loss. In bf16 mode the input feature map
            # streams in bf16 with f32 accumulation — pre-casting the full-res
            # map to fp32 materializes a 2x-sized copy of the largest decoder
            # tensor just to feed a 1x1 conv.
            seg = SegHead(
                self.num_classes, rank=len(stride), dtype=self.dtype,
                name=f"seg{s - 1}",
            )(x)
            seg_outputs.append(seg)
            lres = x

        seg_outputs = seg_outputs[::-1]  # highest resolution first
        if self.deep_supervision:
            return seg_outputs
        return seg_outputs[0]
