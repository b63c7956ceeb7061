"""Device-mesh construction.

The reference bootstraps parallelism with `mp.spawn` + NCCL process groups
(ref dinounet/run/run_training.py:104-138,169-194) and SLURM env plumbing
(ref dinounet/dinov3/distributed/torch_distributed_wrapper.py:114-346). On
TPU both collapse into: `jax.distributed.initialize()` once per host, then a
`Mesh` over `jax.devices()` whose axes name the parallelism strategy. All
collectives ride ICI within a slice (DCN across slices) — XLA picks the
transport; there is no backend selection.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a 2-D ('data', 'model') mesh over the available devices.

    n_model=1 gives pure data parallelism (the DinoUNet s/b/l training
    configuration — replaces DDP, ref nnUNetTrainer.py:216-218). n_model>1
    additionally shards the frozen ViT backbone megatron-style for
    dinounet_7b (BASELINE.json config 4: "backbone sharded over a TPU mesh
    via GSPMD").

    The model axis is placed innermost so model-parallel collectives
    (all-reduce of row-parallel matmul partials) ride the fastest ICI links
    between physically-adjacent chips.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if n % n_model != 0:
        raise ValueError(f"device count {n} not divisible by n_model={n_model}")
    grid = devices.reshape(n // n_model, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def multihost_initialize(**kwargs) -> None:
    """Initialize cross-host JAX distributed state (idempotent).

    TPU-native replacement for `dist.init_process_group("nccl")`
    (ref run/run_training.py:104-106): coordinator discovery comes from the
    TPU runtime environment; no localhost/free-port dance needed.

    Only re-entrant initialization is tolerated (matching the reference's
    tolerance for repeated setup_ddp calls); any other failure — wrong
    coordinator address, process-count mismatch, dead coordinator — raises,
    so misconfiguration cannot silently degrade to a single-host run.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        msg = str(e).lower()
        # jax <=0.4 raises "...already initialized"; jax 0.9 raises
        # "distributed.initialize should only be called once."
        if "already initialized" in msg or "only be called once" in msg:
            return
        raise
