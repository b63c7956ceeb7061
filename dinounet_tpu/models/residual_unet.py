"""ResidualEncoderUNet: residual-encoder nnU-Net variant built from plans.json.

Equivalent of dynamic_network_architectures' ResidualEncoderUNet as planned by
the reference's ResEncUNetPlanner
(ref: dinounet/experiment_planning/experiment_planners/resencUNet_planner.py:14,
plans arch 'dynamic_network_architectures.architectures.unet.ResidualEncoderUNet').

Encoder stages are stacks of BasicBlockD-style residual blocks: the first
block of a stage carries the stride and projects the skip with a strided 1x1
conv; each block is conv-norm-act-conv-norm with the nonlinearity applied
after the residual add. The decoder is the shared UNetDecoder. NHWC.
"""

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dinounet_tpu.models.decoder import UNetDecoder
from dinounet_tpu.models.layers import Norm, conv_kaiming_init, nonlin_fn
from dinounet_tpu.utilities.registry import resolve_op_name


class ResidualBlock(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    norm: str
    norm_kwargs: Optional[dict]
    nonlin: str
    nonlin_kwargs: Optional[dict]
    conv_bias: bool
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nonlin_fn(self.nonlin, self.nonlin_kwargs)
        nk = self.norm_kwargs or {}
        y = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding="SAME", use_bias=self.conv_bias, dtype=self.dtype,
                    kernel_init=conv_kaiming_init, name="conv1")(x)
        y = Norm(self.norm, eps=nk.get("eps", 1e-5), name="norm1")(y, train=train)
        y = act(y)
        y = nn.Conv(self.features, self.kernel_size, strides=(1, 1),
                    padding="SAME", use_bias=self.conv_bias, dtype=self.dtype,
                    kernel_init=conv_kaiming_init, name="conv2")(y)
        y = Norm(self.norm, eps=nk.get("eps", 1e-5), name="norm2")(y, train=train)

        needs_projection = (
            x.shape[-1] != self.features or tuple(self.strides) != (1, 1)
        )
        if needs_projection:
            x = nn.Conv(self.features, (1, 1), strides=self.strides,
                        use_bias=False, dtype=self.dtype,
                        kernel_init=conv_kaiming_init, name="proj")(x)
            x = Norm(self.norm, eps=nk.get("eps", 1e-5), name="proj_norm")(
                x, train=train)
        return act(x + y)


@dataclasses.dataclass(frozen=True)
class ResidualUNetConfig:
    num_classes: int
    features_per_stage: Tuple[int, ...]
    kernel_sizes: Tuple[Tuple[int, int], ...]
    strides: Tuple[Tuple[int, int], ...]
    n_blocks_per_stage: Tuple[int, ...]
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
                        deep_supervision: Optional[bool] = None) -> "ResidualUNetConfig":
        n_stages = arch["n_stages"]
        # ResEnc plans use 'n_blocks_per_stage'; tolerate 'n_conv_per_stage'
        blocks = arch.get("n_blocks_per_stage", arch.get("n_conv_per_stage"))
        return cls(
            num_classes=num_classes,
            features_per_stage=tuple(arch["features_per_stage"]),
            kernel_sizes=tuple(tuple(k) for k in arch["kernel_sizes"]),
            strides=tuple(tuple(s) for s in arch["strides"]),
            n_blocks_per_stage=tuple(
                [blocks] * n_stages if isinstance(blocks, int) else blocks),
            n_conv_per_stage_decoder=tuple(
                [arch["n_conv_per_stage_decoder"]] * (n_stages - 1)
                if isinstance(arch["n_conv_per_stage_decoder"], int)
                else arch["n_conv_per_stage_decoder"]),
            conv_bias=arch.get("conv_bias", True),
            norm=resolve_op_name(arch.get("norm_op")),
            norm_kwargs=arch.get("norm_op_kwargs") or {},
            nonlin=resolve_op_name(arch.get("nonlin")),
            nonlin_kwargs=arch.get("nonlin_kwargs") or {},
            deep_supervision=(
                arch.get("deep_supervision", False)
                if deep_supervision is None else deep_supervision),
        )


class ResidualEncoderUNet(nn.Module):
    cfg: ResidualUNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = self.cfg
        cdt = jnp.dtype(cfg.dtype)
        x = x.astype(cdt)
        skips: List[jnp.ndarray] = []
        for s in range(len(cfg.features_per_stage)):
            for b in range(cfg.n_blocks_per_stage[s]):
                x = ResidualBlock(
                    features=cfg.features_per_stage[s],
                    kernel_size=tuple(cfg.kernel_sizes[s]),
                    strides=tuple(cfg.strides[s]) if b == 0 else (1, 1),
                    norm=cfg.norm, norm_kwargs=cfg.norm_kwargs,
                    nonlin=cfg.nonlin, nonlin_kwargs=cfg.nonlin_kwargs,
                    conv_bias=cfg.conv_bias, dtype=cdt, name=f"enc{s}_block{b}",
                )(x, train=train)
            skips.append(x)
        return UNetDecoder(
            encoder_channels=cfg.features_per_stage,
            encoder_strides=cfg.strides,
            encoder_kernel_sizes=cfg.kernel_sizes,
            num_classes=cfg.num_classes,
            n_conv_per_stage=cfg.n_conv_per_stage_decoder,
            deep_supervision=cfg.deep_supervision and train,
            norm=cfg.norm, norm_kwargs=cfg.norm_kwargs,
            nonlin=cfg.nonlin, nonlin_kwargs=cfg.nonlin_kwargs,
            conv_bias=cfg.conv_bias, dtype=cdt, name="decoder",
        )(skips, train=train)
