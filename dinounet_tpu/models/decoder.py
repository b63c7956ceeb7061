"""nnU-Net-style conv U-Net decoder with deep-supervision heads.

Capability parity with ref: dinounet_training.py:517-629 (UNetDecoder): per stage
transpconv(below) -> concat(skip) -> StackedConvBlocks -> 1x1 seg head; all DS
heads are always built (so checkpoints load regardless of the DS flag); returns
the list of seg outputs (highest resolution first) when deep supervision is on,
else the top output.
"""

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dinounet_tpu.models.layers import StackedConvBlocks, TransposedConv


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
            # fp32 logits for a stable loss
            seg = nn.Conv(
                self.num_classes, (1,) * len(stride), use_bias=True,
                dtype=jnp.float32, name=f"seg{s - 1}",
            )(x.astype(jnp.float32))
            seg_outputs.append(seg)
            lres = x

        seg_outputs = seg_outputs[::-1]  # highest resolution first
        if self.deep_supervision:
            return seg_outputs
        return seg_outputs[0]
