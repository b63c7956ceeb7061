"""TPU-native parallelism: device meshes + GSPMD sharding rules.

Replaces the reference's torch-distributed stack (DDP/NCCL process groups,
mp.spawn launch, AllGatherGrad — ref dinounet/run/run_training.py:104-194,
dinounet/utilities/ddp_allgather.py:25-48, and the dormant FSDP tree at
dinounet/dinov3/fsdp/ac_compile_parallelize.py:36-170) with a single
`jax.sharding.Mesh` and GSPMD partition specs: gradients sync via psum that
XLA inserts automatically, parameters of the 7B backbone shard megatron-style
over a 'model' axis, and batches shard over a 'data' axis (SURVEY.md §2.10).
"""

from dinounet_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    multihost_initialize,
)
from dinounet_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    param_spec_tree,
    replicated,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "multihost_initialize",
    "batch_sharding",
    "param_shardings",
    "param_spec_tree",
    "replicated",
]
