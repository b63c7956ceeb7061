"""Orbax sharded checkpointing (the 7B multi-chip save path).

The reference's equivalent is the dormant torch-DCP checkpointer
(dinov3/checkpointer/checkpointer.py:45-330). Here: GSPMD-sharded param trees
round-trip through orbax on an 8-way CPU mesh, preserving values and restoring
onto the mesh when an abstract template with shardings is given.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dinounet_tpu.parallel import make_mesh
from dinounet_tpu.training.checkpointing import (
    load_checkpoint_sharded,
    save_checkpoint_sharded,
)


@pytest.fixture()
def sharded_state(rng):
    devices = jax.devices("cpu")[:8]
    mesh = make_mesh(n_model=2, devices=devices)
    w = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    w = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    b = jax.device_put(b, NamedSharding(mesh, P()))
    return mesh, {"network_weights": {"params": {"dense": {"kernel": w, "bias": b}}},
                  "optimizer_state": {"momentum": jnp.zeros((8,))}}


def test_roundtrip_values_and_meta(tmp_path, sharded_state):
    mesh, state = sharded_state
    ckpt = dict(state, current_epoch=7, trainer_name="nnUNetTrainer",
                _best_ema=0.93,
                inference_allowed_mirroring_axes=(0, 1))
    d = str(tmp_path / "ckpt_sharded")
    save_checkpoint_sharded(ckpt, d)
    assert os.path.isdir(os.path.join(d, "arrays"))

    back = load_checkpoint_sharded(d)
    assert back["current_epoch"] == 7
    assert back["trainer_name"] == "nnUNetTrainer"
    assert back["inference_allowed_mirroring_axes"] == (0, 1)
    np.testing.assert_allclose(
        np.asarray(back["network_weights"]["params"]["dense"]["kernel"]),
        np.asarray(state["network_weights"]["params"]["dense"]["kernel"]))


def test_restore_onto_mesh_with_template(tmp_path, sharded_state):
    mesh, state = sharded_state
    d = str(tmp_path / "ckpt_sharded")
    save_checkpoint_sharded(dict(state, current_epoch=1), d)

    def abstract(x):
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)

    template = {
        "network_weights": jax.tree.map(abstract, state["network_weights"]),
        "optimizer_state": jax.tree.map(abstract, state["optimizer_state"]),
    }
    back = load_checkpoint_sharded(d, template)
    k = back["network_weights"]["params"]["dense"]["kernel"]
    assert isinstance(k, jax.Array)
    assert k.sharding.spec == P(None, "model")
    np.testing.assert_allclose(
        np.asarray(k),
        np.asarray(state["network_weights"]["params"]["dense"]["kernel"]))
