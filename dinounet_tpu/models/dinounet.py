"""DinoUNet: frozen DINOv3 ViT + ViT-Adapter + FAPM + U-Net decoder.

Capability parity with ref: dinounet_training.py:29-48 (model registry),
:632-829 (DinoUNet): parses the plans.json `architecture` dict (op strings
resolved via the registry instead of pydoc.locate), forces n_stages=4, builds
the adapter with the reference's fixed hyperparameters (pretrain_size=512,
conv_inplane=64, n_points=4, deform_num_heads=16, drop_path 0.3, cffn_ratio
0.25, deform_ratio 0.5; ref :754-769) and the conv decoder from plans.

TPU design: the backbone runs inside the same jit as everything else, in bf16,
wrapped in stop_gradient (the reference's no_grad + autocast, ref
dinov3_adapter.py:422-426); model I/O is NHWC.
"""

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dinounet_tpu.models.adapter import DINOv3Adapter
from dinounet_tpu.models.decoder import UNetDecoder
from dinounet_tpu.models.fapm import FAPMEncoder
from dinounet_tpu.models.vit import VIT_CONFIGS, DinoViT, ViTConfig
from dinounet_tpu.utilities.registry import resolve_op_name

# ref: dinounet_training.py:29-48
DINOV3_MODEL_NAMES = {
    "dinounet_s": "dinov3_vits16",
    "dinounet_b": "dinov3_vitb16",
    "dinounet_l": "dinov3_vitl16",
    "dinounet_7b": "dinov3_vit7b16",
}
DINOV3_INTERACTION_INDEXES = {
    "dinounet_s": (2, 5, 8, 11),
    "dinounet_b": (2, 5, 8, 11),
    "dinounet_l": (4, 11, 17, 23),
    "dinounet_7b": (9, 19, 29, 39),
}


@dataclasses.dataclass(frozen=True)
class DinoUNetConfig:
    vit: ViTConfig
    interaction_indexes: Tuple[int, ...]
    num_classes: int = 2
    features_per_stage: Tuple[int, ...] = (32, 64, 128, 256)
    kernel_sizes: Tuple[Tuple[int, int], ...] = ((3, 3),) * 4
    strides: Tuple[Tuple[int, int], ...] = ((1, 1), (2, 2), (2, 2), (2, 2))
    n_conv_per_stage_decoder: Tuple[int, ...] = (2, 2, 2)
    conv_bias: bool = True
    norm: str = "instancenorm"
    norm_kwargs: Optional[dict] = None
    nonlin: str = "leaky_relu"
    nonlin_kwargs: Optional[dict] = None
    deep_supervision: bool = False
    fapm_rank: int = 256
    conv_inplane: int = 64
    n_points: int = 4
    deform_num_heads: int = 16
    drop_path_rate: float = 0.3
    cffn_ratio: float = 0.25
    deform_ratio: float = 0.5
    remat_adapter: bool = True
    dtype: str = "bfloat16"

    @classmethod
    def from_plans_arch(cls, arch: dict, num_classes: int,
                        model_name: str = "dinounet_s",
                        deep_supervision: Optional[bool] = None,
                        **overrides) -> "DinoUNetConfig":
        """Build from a plans.json network architecture dict (ref :663-711)."""
        n_stages = arch["n_stages"]
        features = list(arch["features_per_stage"])
        kernels = [tuple(k) for k in arch["kernel_sizes"]]
        strides = [tuple(s) for s in arch["strides"]]
        n_dec = list(arch["n_conv_per_stage_decoder"])
        if n_stages != 4:
            # DINOv3_Adapter outputs exactly 4 scales (ref :703-711)
            base = features[0] if features else 32
            features = [base * (2 ** i) for i in range(4)]
            kernels = (kernels + [kernels[-1]] * 4)[:4]
            strides = [(1, 1)] + [(2, 2)] * 3
            n_dec = (n_dec + [n_dec[-1]] * 3)[:3]
        vit_name = DINOV3_MODEL_NAMES[model_name]
        return cls(
            vit=VIT_CONFIGS[vit_name],
            interaction_indexes=DINOV3_INTERACTION_INDEXES[model_name],
            num_classes=num_classes,
            features_per_stage=tuple(features),
            kernel_sizes=tuple(kernels),
            strides=tuple(strides),
            n_conv_per_stage_decoder=tuple(n_dec),
            conv_bias=arch.get("conv_bias", False),
            norm=resolve_op_name(arch.get("norm_op")),
            norm_kwargs=arch.get("norm_op_kwargs") or {},
            nonlin=resolve_op_name(arch.get("nonlin")),
            nonlin_kwargs=arch.get("nonlin_kwargs") or {},
            deep_supervision=(
                arch.get("deep_supervision", False)
                if deep_supervision is None else deep_supervision
            ),
            **overrides,
        )


class DinoUNet(nn.Module):
    cfg: DinoUNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: NHWC image batch (B, H, W, C); returns fp32 logits (B, H, W, classes)
        (or a list, highest resolution first, under deep supervision)."""
        cfg = self.cfg
        B, H, W, C = x.shape
        cdt = jnp.dtype(cfg.dtype)

        # channel handling: replicate to 3 channels (ref :489-497)
        if C == 1:
            x3 = jnp.repeat(x, 3, axis=-1)
        elif C == 2:
            x3 = jnp.concatenate([x, x[..., :1]], axis=-1)
        elif C == 3:
            x3 = x
        else:
            x3 = x[..., :3]
        x3 = x3.astype(cdt)

        # frozen backbone: bf16, no gradients (ref dinov3_adapter.py:422-426)
        backbone_outputs = DinoViT(cfg.vit, name="backbone")(
            x3, cfg.interaction_indexes
        )
        backbone_outputs = jax.lax.stop_gradient(backbone_outputs)

        adapter_feats = DINOv3Adapter(
            embed_dim=cfg.vit.embed_dim,
            conv_inplane=cfg.conv_inplane,
            n_points=cfg.n_points,
            deform_num_heads=cfg.deform_num_heads,
            drop_path_rate=cfg.drop_path_rate,
            cffn_ratio=cfg.cffn_ratio,
            deform_ratio=cfg.deform_ratio,
            patch_size=cfg.vit.patch_size,
            remat=cfg.remat_adapter and train,
            dtype=cdt,
            name="adapter",
        )(x3, backbone_outputs, train=train)

        skips = FAPMEncoder(
            target_channels=cfg.features_per_stage,
            norm=cfg.norm, norm_kwargs=cfg.norm_kwargs,
            nonlin=cfg.nonlin, nonlin_kwargs=cfg.nonlin_kwargs,
            conv_bias=cfg.conv_bias, rank=cfg.fapm_rank, dtype=cdt,
            name="encoder",
        )(adapter_feats, (H, W), train=train)

        return UNetDecoder(
            encoder_channels=cfg.features_per_stage,
            encoder_strides=((2, 2),) * len(cfg.features_per_stage),
            encoder_kernel_sizes=((3, 3),) * len(cfg.features_per_stage),
            num_classes=cfg.num_classes,
            n_conv_per_stage=cfg.n_conv_per_stage_decoder,
            deep_supervision=cfg.deep_supervision and train,
            norm=cfg.norm, norm_kwargs=cfg.norm_kwargs,
            nonlin=cfg.nonlin, nonlin_kwargs=cfg.nonlin_kwargs,
            conv_bias=cfg.conv_bias, dtype=cdt,
            name="decoder",
        )(skips, train=train)


def backbone_param_filter(path: Tuple[str, ...]) -> bool:
    """True for frozen (backbone) params; used to mask the optimizer."""
    return len(path) > 0 and path[0] == "backbone"
