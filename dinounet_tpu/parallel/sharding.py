"""GSPMD partition specs for DinoUNet parameter trees.

The reference has no tensor parallelism (SURVEY.md §2.10: TP absent); its
only sharded-parameter machinery is the dormant FSDP2 tree for SSL
pretraining (ref dinov3/fsdp/ac_compile_parallelize.py:36-170). For the
TPU build, sharding the frozen ViT-7B backbone is a requirement
(BASELINE.json config 4), and with GSPMD it reduces to annotating weight
dims with a 'model' mesh axis — XLA inserts the all-reduces.

Megatron-style layout over the backbone transformer blocks:
  * qkv / fc1 / w1 / w2 kernels: column-parallel  -> P(None, 'model')
    (their biases shard the output dim            -> P('model'))
  * proj / fc2 / w3 kernels:     row-parallel     -> P('model', None)
    (their biases stay replicated; XLA all-reduces the matmul partials)
  * everything else (patch embed, norms, cls/storage tokens, the whole
    trainable adapter/FAPM/decoder — tiny next to the backbone): replicated.

Column→row pairing means activations inside a block stay sharded over heads
/ FFN-hidden with exactly one all-reduce per matmul pair, the standard
recipe (scaling-book); head counts (32 for 7B) divide any realistic model
axis.
"""

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dinounet_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# param name -> (kernel spec, bias spec), within backbone transformer blocks
_COLUMN = (P(None, MODEL_AXIS), P(MODEL_AXIS))
_ROW = (P(MODEL_AXIS, None), P())
_BLOCK_RULES = {
    "qkv": _COLUMN,
    "fc1": _COLUMN,
    "w1": _COLUMN,
    "w2": _COLUMN,  # SwiGLU gate branch: also column-parallel
    "proj": _ROW,
    "fc2": _ROW,
    "w3": _ROW,  # SwiGLU out projection: row-parallel
}


def _spec_for(path: Tuple[str, ...], leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if "backbone" in names:
        # scanned-backbone layout (blocks_scan, round 4): every block leaf
        # carries a leading depth axis — shard the same dims, depth
        # replicated (scan slices per-iteration along axis 0)
        stacked = "blocks_scan" in names
        for i, n in enumerate(names):
            if n in _BLOCK_RULES and i + 1 < len(names):
                kernel_spec, bias_spec = _BLOCK_RULES[n]
                if names[i + 1] == "kernel" and leaf.ndim == 2 + stacked:
                    return P(None, *kernel_spec) if stacked else kernel_spec
                if names[i + 1] == "bias" and leaf.ndim == 1 + stacked:
                    return P(None, *bias_spec) if stacked else bias_spec
    return P()


def param_spec_tree(params: Any) -> Any:
    """PartitionSpec pytree matching `params` (a flax params dict)."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for `params` on `mesh`.

    With a 1-wide model axis every spec degenerates to replicated, so the
    same code path serves s/b/l data-parallel training and 7B GSPMD.
    """
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_spec_tree(params)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis (replaces DDP's per-rank batch
    split, ref nnUNetTrainer.py:308-353)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
