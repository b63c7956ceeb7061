"""FAPM — fidelity-aware projection module (the paper's novelty) + encoder wrapper.

Capability parity with ref: dinounet_training.py:355-514:
  * FAPM: shared 1x1 basis + per-scale specific 1x1 basis (both embed_dim->rank),
    FiLM generator (rank -> 2*rank) from the shared branch modulating the specific
    branch, then per-scale refinement (1x1 reduce -> norm/act -> DW-sep 3x3 ->
    1x1 -> SE) with a projected residual from the modulated features.
  * Encoder adapter: channel-replicate 1->3, run DINOv3Adapter, FAPM over the 4
    scale maps, learnable x2 upsampling of each skip to (H/2^i, W/2^i).
"""

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dinounet_tpu.models.layers import (
    DepthwiseSeparableConv,
    LearnableUpsample,
    Norm,
    SqueezeExcitation,
    conv_kaiming_init,
    nonlin_fn,
)


class FAPM(nn.Module):
    """ref: dinounet_training.py:355-441."""
    rank: int
    out_channels: Sequence[int]
    norm: str = "instancenorm"
    norm_kwargs: Optional[dict] = None
    nonlin: str = "leaky_relu"
    nonlin_kwargs: Optional[dict] = None
    conv_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_list: List[jnp.ndarray], train: bool = False):
        act = nonlin_fn(self.nonlin, self.nonlin_kwargs)

        def conv1x1(feats, name):
            return nn.Conv(feats, (1, 1), use_bias=self.conv_bias, dtype=self.dtype,
                           kernel_init=conv_kaiming_init, name=name)

        shared = conv1x1(self.rank, "shared_basis")
        outs = []
        for i, (x, oc) in enumerate(zip(x_list, self.out_channels)):
            z_shared = shared(x)
            z_specific = conv1x1(self.rank, f"specific_basis{i}")(x)
            gamma_beta = conv1x1(2 * self.rank, f"film{i}")(z_shared)
            gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
            z_mod = gamma * z_specific + beta

            r = conv1x1(oc, f"reduce{i}")(z_mod)
            r = Norm(self.norm, name=f"reduce_norm{i}")(r, train=train)
            r = act(r)
            r = DepthwiseSeparableConv(
                oc, norm=self.norm, norm_kwargs=self.norm_kwargs,
                nonlin=self.nonlin, nonlin_kwargs=self.nonlin_kwargs,
                use_bias=self.conv_bias, dtype=self.dtype, name=f"dwsep{i}",
            )(r, train=train)
            r = conv1x1(oc, f"refine{i}")(r)
            r = SqueezeExcitation(dtype=self.dtype, name=f"se{i}")(r)

            if self.rank != oc:
                shortcut = conv1x1(oc, f"shortcut{i}")(z_mod)
            else:
                shortcut = z_mod
            outs.append(r + shortcut)
        return outs


class FAPMEncoder(nn.Module):
    """DINOv3Adapter features -> FAPM -> learnable upsample to U-Net skip sizes.

    ref: dinounet_training.py:444-514 (the active DINOv3EncoderAdapter). Skip i is
    upsampled to (H/2^i, W/2^i); with 512-input the adapter scale maps sit at
    1/4..1/32, so each skip needs exactly two shared-weight 2x transposed convs.
    """
    target_channels: Sequence[int]
    norm: str = "instancenorm"
    norm_kwargs: Optional[dict] = None
    nonlin: str = "leaky_relu"
    nonlin_kwargs: Optional[dict] = None
    conv_bias: bool = False
    rank: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, adapter_feats: List[jnp.ndarray], image_hw: Tuple[int, int],
                 train: bool = False):
        H, W = image_hw
        ys = FAPM(
            rank=self.rank, out_channels=tuple(self.target_channels),
            norm=self.norm, norm_kwargs=self.norm_kwargs,
            nonlin=self.nonlin, nonlin_kwargs=self.nonlin_kwargs,
            conv_bias=self.conv_bias, dtype=self.dtype, name="fapm",
        )(adapter_feats, train=train)
        skips = []
        for i, y in enumerate(ys):
            target = (H // (2 ** i), W // (2 ** i))
            skips.append(
                LearnableUpsample(dtype=self.dtype, name=f"up{i}")(
                    y, target, train=train)
            )
        return skips
