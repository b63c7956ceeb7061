"""PlainConvUNet: the stock nnU-Net architecture built from plans.json.

Equivalent of dynamic_network_architectures' PlainConvUNet as used by the
reference's default (non-Dino) trainer path
(ref: dinounet/utilities/get_network_from_plans.py:9, plans arch
'dynamic_network_architectures.architectures.unet.PlainConvUNet'). NHWC.
"""

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dinounet_tpu.models.decoder import UNetDecoder
from dinounet_tpu.models.layers import StackedConvBlocks
from dinounet_tpu.utilities.registry import resolve_op_name


@dataclasses.dataclass(frozen=True)
class PlainUNetConfig:
    num_classes: int
    features_per_stage: Tuple[int, ...]
    kernel_sizes: Tuple[Tuple[int, int], ...]
    strides: Tuple[Tuple[int, int], ...]
    n_conv_per_stage: Tuple[int, ...]
    n_conv_per_stage_decoder: Tuple[int, ...]
    conv_bias: bool = True
    norm: str = "instancenorm"
    norm_kwargs: Optional[dict] = None
    nonlin: str = "leaky_relu"
    nonlin_kwargs: Optional[dict] = None
    deep_supervision: bool = False
    dtype: str = "bfloat16"

    @classmethod
    def from_plans_arch(cls, arch: dict, num_classes: int,
                        deep_supervision: Optional[bool] = None) -> "PlainUNetConfig":
        return cls(
            num_classes=num_classes,
            features_per_stage=tuple(arch["features_per_stage"]),
            kernel_sizes=tuple(tuple(k) for k in arch["kernel_sizes"]),
            strides=tuple(tuple(s) for s in arch["strides"]),
            n_conv_per_stage=tuple(
                [arch["n_conv_per_stage"]] * arch["n_stages"]
                if isinstance(arch["n_conv_per_stage"], int) else arch["n_conv_per_stage"]
            ),
            n_conv_per_stage_decoder=tuple(
                [arch["n_conv_per_stage_decoder"]] * (arch["n_stages"] - 1)
                if isinstance(arch["n_conv_per_stage_decoder"], int)
                else arch["n_conv_per_stage_decoder"]
            ),
            conv_bias=arch.get("conv_bias", True),
            norm=resolve_op_name(arch.get("norm_op")),
            norm_kwargs=arch.get("norm_op_kwargs") or {},
            nonlin=resolve_op_name(arch.get("nonlin")),
            nonlin_kwargs=arch.get("nonlin_kwargs") or {},
            deep_supervision=(
                arch.get("deep_supervision", False)
                if deep_supervision is None else deep_supervision
            ),
        )


class PlainConvUNet(nn.Module):
    cfg: PlainUNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        cdt = jnp.dtype(cfg.dtype)
        x = x.astype(cdt)
        skips: List[jnp.ndarray] = []
        for s in range(len(cfg.features_per_stage)):
            x = StackedConvBlocks(
                n_convs=cfg.n_conv_per_stage[s], features=cfg.features_per_stage[s],
                kernel_size=tuple(cfg.kernel_sizes[s]),
                initial_strides=tuple(cfg.strides[s]),
                norm=cfg.norm, norm_kwargs=cfg.norm_kwargs,
                nonlin=cfg.nonlin, nonlin_kwargs=cfg.nonlin_kwargs,
                conv_bias=cfg.conv_bias, dtype=cdt, name=f"enc{s}",
            )(x, train=train)
            skips.append(x)
        return UNetDecoder(
            encoder_channels=cfg.features_per_stage,
            encoder_strides=cfg.strides,  # decoder stage s upsamples with strides[-s]
            encoder_kernel_sizes=cfg.kernel_sizes,
            num_classes=cfg.num_classes,
            n_conv_per_stage=cfg.n_conv_per_stage_decoder,
            deep_supervision=cfg.deep_supervision and train,
            norm=cfg.norm, norm_kwargs=cfg.norm_kwargs,
            nonlin=cfg.nonlin, nonlin_kwargs=cfg.nonlin_kwargs,
            conv_bias=cfg.conv_bias, dtype=cdt, name="decoder",
        )(skips, train=train)
