"""dinounet_tpu: a TPU-native (JAX/XLA/Pallas/pjit) medical-image-segmentation framework.

Re-implements the full capability surface of Dino U-Net (frozen DINOv3 ViT encoder +
ViT-Adapter + fidelity-aware projector (FAPM) + nnU-Net-style conv U-Net decoder,
with nnU-Net planning/preprocessing/training/inference/evaluation around it) as an
idiomatic TPU framework: flax models, XLA collectives over a device mesh instead of
DDP/NCCL, and a Pallas kernel replacing the CUDA MultiScaleDeformableAttention
extension.

Reference capability surface: /root/reference (yifangao112/DinoUNet); see SURVEY.md.
"""

__version__ = "0.1.0"

# Enable the on-disk XLA executable cache as early as possible: the DinoUNet
# train step takes minutes to compile (Pallas MSDA kernels inside a large
# differentiated graph); with the cache, every process after the first loads
# the compiled executable from disk. Opt out: DINOUNET_TPU_COMPILE_CACHE=0.
from dinounet_tpu.configuration import enable_persistent_compilation_cache as _epcc

_epcc()
del _epcc
