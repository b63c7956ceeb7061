"""Checkpoint save/load.

Capability parity with ref: nnUNetTrainer.py:1083-1144: a single-file checkpoint
dict with network weights, optimizer state, logger state, best-EMA, epoch,
init_args, trainer_name and mirroring axes; written as checkpoint_latest /
checkpoint_best / checkpoint_final (.pth filenames kept for layout parity).

JAX pytrees are serialized with flax.serialization (msgpack) inside a pickled
envelope; the structure is restored against a template pytree at load time.
"""

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(checkpoint: Dict[str, Any], filename: str,
                    sharded: bool = False) -> None:
    """sharded=True writes an orbax per-shard checkpoint DIRECTORY at
    `filename` (used when the state is GSPMD-sharded over a model axis — the
    single-file path below would gather all ~14 GB of a 7B backbone to one
    host); otherwise a single pickle file. load_checkpoint dispatches on
    what it finds, so the resume chain is oblivious to the format."""
    if sharded:
        import shutil

        if os.path.isfile(filename):
            os.remove(filename)  # format switch mid-run
        tmp = filename + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        save_checkpoint_sharded(checkpoint, tmp)
        if os.path.isdir(filename):
            shutil.rmtree(filename)
        os.replace(tmp, filename)
        return
    ckpt = dict(checkpoint)
    for key in ("network_weights", "optimizer_state"):
        if key in ckpt and ckpt[key] is not None:
            ckpt[key] = _to_numpy_tree(ckpt[key])
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, filename)


def load_checkpoint(filename: str, template: Any = None) -> Dict[str, Any]:
    if os.path.isdir(filename):
        return load_checkpoint_sharded(filename, template)
    with open(filename, "rb") as f:
        return pickle.load(f)


# --------------------------------------------------------------- sharded (7B)

def save_checkpoint_sharded(checkpoint: Dict[str, Any], directory: str) -> None:
    """Orbax-based sharded checkpoint for GSPMD-sharded states (dinounet_7b).

    The single-file path above gathers every array to host — fine for the
    s/b/l trainable states (MBs) but wrong for a 7B backbone sharded over a
    mesh: each host would fetch all ~14 GB. Orbax writes each shard from the
    process that owns it (the TPU-native equivalent of the reference's
    dormant torch-DCP checkpointer, ref dinov3/checkpointer/checkpointer.py:
    45-330). Array pytrees ('network_weights', 'optimizer_state') go through
    orbax; everything else lands in a sidecar meta.pkl with the same key set
    as the single-file checkpoint.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    arrays = {}
    meta = {}
    for k, v in checkpoint.items():
        if k in ("network_weights", "optimizer_state") and v is not None:
            arrays[k] = v
        else:
            meta[k] = v
    if "optimizer_state" in arrays:
        # optax states are NamedTuple pytrees; orbax would dict-ify them and
        # lose the structure. Store ordered flat leaves; the loader
        # unflattens against tx.init's treedef (load_checkpoint in trainer).
        arrays["optimizer_state"] = {
            f"leaf_{i:04d}": leaf
            for i, leaf in enumerate(jax.tree.leaves(arrays["optimizer_state"]))
        }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(directory, "arrays"), arrays, force=True)
    with open(os.path.join(directory, "meta.pkl"), "wb") as f:
        pickle.dump(meta, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint_sharded(directory: str, template: Any = None) -> Dict[str, Any]:
    """Restore a sharded checkpoint written by save_checkpoint_sharded.

    template: optional abstract pytree ({'network_weights': ...,
    'optimizer_state': ...} of jax.ShapeDtypeStruct with shardings) to restore
    arrays directly onto their mesh placements; without it arrays come back
    as host numpy (fine for single-host use).
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    arrays_dir = os.path.join(directory, "arrays")
    if template is not None:
        # mirror the save path's optimizer-state leaf flattening so the
        # template tree structure matches what is on disk
        opt_template = None
        if isinstance(template, dict) and template.get("optimizer_state") is not None:
            opt_template = template["optimizer_state"]
            template = dict(template)
            template["optimizer_state"] = {
                f"leaf_{i:04d}": leaf
                for i, leaf in enumerate(jax.tree.leaves(opt_template))
            }
        with ocp.StandardCheckpointer() as ckptr:
            arrays = ckptr.restore(arrays_dir, template)
        if opt_template is not None:
            arrays["optimizer_state"] = maybe_unflatten_opt_state(
                arrays["optimizer_state"], opt_template)
    else:
        # restore as host numpy: the saved shardings reference the writing
        # run's device topology, which need not exist here
        with ocp.PyTreeCheckpointer() as ckptr:
            meta_tree = ckptr.metadata(arrays_dir).item_metadata.tree
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree,
                is_leaf=lambda x: hasattr(x, "shape"))
            arrays = ckptr.restore(
                arrays_dir, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    with open(os.path.join(directory, "meta.pkl"), "rb") as f:
        out = pickle.load(f)
    out.update(arrays)
    return out


def maybe_unflatten_opt_state(state: Any, template: Any) -> Any:
    """Reverse save_checkpoint_sharded's leaf flattening of the optax state
    (a {'leaf_0000': ...} dict) against the treedef of a freshly-initialized
    optimizer state; pass non-flattened states through unchanged."""
    if (isinstance(state, dict) and state
            and all(isinstance(k, str) and k.startswith("leaf_") for k in state)):
        leaves = [state[k] for k in sorted(state)]
        return jax.tree.unflatten(jax.tree.structure(template), leaves)
    return state
