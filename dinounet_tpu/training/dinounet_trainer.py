"""DinoUNet trainer family.

Capability parity with ref: dinounet_training.py:833-956: a base trainer that
ignores the plans' architecture class and builds DinoUNet (frozen DINOv3
backbone + adapter + FAPM + decoder) instead, with class-level configuration
injection (`set_network_config`) and four size-variant subclasses pinning the
backbone name / pretrained path. Deep supervision off (base class
nnUNetTrainerNoDeepSupervision, ref :833).
"""

import os
from typing import List, Optional, Tuple, Union

from dinounet_tpu.models.dinounet import (
    DINOV3_INTERACTION_INDEXES,
    DINOV3_MODEL_NAMES,
    DinoUNet,
    DinoUNetConfig,
)
from dinounet_tpu.training.trainer_variants import nnUNetTrainerNoDeepSupervision
from dinounet_tpu.utilities import registry


@registry.trainers.register("DinoUNetTrainer")
class DinoUNetTrainer(nnUNetTrainerNoDeepSupervision):
    """ref dinounet_training.py:833-881."""

    _network_config = None
    _dinov3_pretrained_path = None
    _dinov3_model_name = "dinounet_s"

    @classmethod
    def set_network_config(cls, network_config, dinov3_pretrained_path=None,
                          dinov3_model_name=None, adapter_type: str = "default"):
        """Class-level config injection, copied down to the base class so the
        static network builder sees it (ref :842-855)."""
        cls._network_config = network_config
        if dinov3_pretrained_path is not None:
            cls._dinov3_pretrained_path = dinov3_pretrained_path
        if dinov3_model_name is not None:
            cls._dinov3_model_name = dinov3_model_name
        DinoUNetTrainer._network_config = cls._network_config
        DinoUNetTrainer._dinov3_model_name = cls._dinov3_model_name
        DinoUNetTrainer._dinov3_pretrained_path = cls._dinov3_pretrained_path

    @staticmethod
    def build_network_architecture(architecture_class_name: str, arch_init_kwargs: dict,
                                   arch_init_kwargs_req_import, num_input_channels: int,
                                   num_output_channels: int,
                                   enable_deep_supervision: bool = True):
        """Ignores the plans' architecture class; returns DinoUNet (ref :857-881)."""
        if DinoUNetTrainer._network_config is not None:
            arch = dict(DinoUNetTrainer._network_config["architecture"])
        else:
            arch = dict(arch_init_kwargs)
            arch.setdefault("n_stages", len(arch.get("features_per_stage", [32, 64, 128, 256])))
        cfg = DinoUNetConfig.from_plans_arch(
            arch, num_classes=num_output_channels,
            model_name=DinoUNetTrainer._dinov3_model_name,
            deep_supervision=enable_deep_supervision,
        )
        return DinoUNet(cfg)

    def initialize(self):
        super().initialize()
        # load pretrained DINOv3 backbone weights if a converted checkpoint exists
        path = DinoUNetTrainer._dinov3_pretrained_path
        if path and os.path.exists(path):
            from dinounet_tpu.models.convert import load_dinov3_params_into

            self.variables = load_dinov3_params_into(self.variables, path)
            self.print_to_log_file(f"Loaded DINOv3 backbone weights from {path}")
        else:
            self.print_to_log_file(
                "WARNING: no pretrained DINOv3 checkpoint found "
                f"({path}); the frozen backbone is randomly initialized."
            )


@registry.trainers.register("DinoUNetTrainer_s")
class DinoUNetTrainer_s(DinoUNetTrainer):
    """DINOv3 ViT-S/16 (ref :885-893)."""
    _dinov3_model_name = "dinounet_s"
    _dinov3_pretrained_path = "dinounet/checkpoints/dinov3_vits16_pretrain.msgpack"


@registry.trainers.register("DinoUNetTrainer_b")
class DinoUNetTrainer_b(DinoUNetTrainer):
    """DINOv3 ViT-B/16 (ref :897-905)."""
    _dinov3_model_name = "dinounet_b"
    _dinov3_pretrained_path = "dinounet/checkpoints/dinov3_vitb16_pretrain.msgpack"


@registry.trainers.register("DinoUNetTrainer_l")
class DinoUNetTrainer_l(DinoUNetTrainer):
    """DINOv3 ViT-L/16 (ref :909-917)."""
    _dinov3_model_name = "dinounet_l"
    _dinov3_pretrained_path = "dinounet/checkpoints/dinov3_vitl16_pretrain.msgpack"


@registry.trainers.register("DinoUNetTrainer_7b")
class DinoUNetTrainer_7b(DinoUNetTrainer):
    """DINOv3 ViT-7B/16 (ref :921-930)."""
    _dinov3_model_name = "dinounet_7b"
    _dinov3_pretrained_path = "dinounet/checkpoints/dinov3_vit7b16_pretrain.msgpack"


# ref dinounet_training.py:935-940
DINOV3_TRAINERS = {
    "dinounet_s": DinoUNetTrainer_s,
    "dinounet_b": DinoUNetTrainer_b,
    "dinounet_l": DinoUNetTrainer_l,
    "dinounet_7b": DinoUNetTrainer_7b,
}


def get_dinov3_trainer(model_name: str):
    if model_name not in DINOV3_TRAINERS:
        raise ValueError(
            f"Unsupported model: {model_name}. Supported: {list(DINOV3_TRAINERS)}"
        )
    return DINOV3_TRAINERS[model_name]
