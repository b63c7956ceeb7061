"""End-to-end training smoke tests: plan -> preprocess -> train (tiny) ->
sliding-window validation -> metrics. Runs the full stack on CPU with a toy
dataset and a shrunken schedule."""

import os

import numpy as np
import pytest

from dinounet_tpu.api import evaluate, plan_and_preprocess
from dinounet_tpu.utilities.json_export import load_json

from helpers import make_png_dataset


@pytest.fixture()
def nnunet_env(tmp_path, monkeypatch):
    raw = tmp_path / "raw"
    pre = tmp_path / "preprocessed"
    res = tmp_path / "results"
    for p in (raw, pre, res):
        p.mkdir()
    monkeypatch.setenv("nnUNet_raw", str(raw))
    monkeypatch.setenv("nnUNet_preprocessed", str(pre))
    monkeypatch.setenv("nnUNet_results", str(res))
    return tmp_path


def test_full_training_pipeline(nnunet_env):
    from dinounet_tpu.run import get_trainer_from_args

    make_png_dataset(str(nnunet_env / "raw"), n_cases=6, size=(72, 64))
    plans_identifier, configs = plan_and_preprocess(
        501, configurations=["2d"], num_processes=[1], verbose=False,
    )
    assert "2d" in configs
    assert configs["2d"]["data_config"]["batch_size"] >= 2

    trainer = get_trainer_from_args(501, "2d", 0, "nnUNetTrainer", plans_identifier)
    trainer.num_epochs = 1
    trainer.num_iterations_per_epoch = 2
    trainer.num_val_iterations_per_epoch = 1
    trainer.run_training()

    # checkpoints written (layout parity: checkpoint_final in fold_0)
    assert os.path.isfile(os.path.join(trainer.output_folder, "checkpoint_final.pth"))
    assert os.path.isfile(os.path.join(trainer.output_folder, "progress.png"))
    assert len(trainer.logger.my_fantastic_logging["train_losses"]) == 1
    assert np.isfinite(trainer.logger.my_fantastic_logging["train_losses"][0])

    # full sliding-window validation + export + metrics
    metrics = trainer.perform_actual_validation()
    assert metrics is not None
    assert "foreground_mean" in metrics and "Dice" in metrics["foreground_mean"]
    val_folder = os.path.join(trainer.output_folder, "validation")
    preds = [f for f in os.listdir(val_folder) if f.endswith(".png")]
    assert len(preds) > 0

    # the evaluate() api over the results folder
    results = evaluate(501, trainer.output_folder)
    assert "foreground_mean" in results
    assert np.isfinite(results["foreground_mean"]["Dice"]) or np.isnan(
        results["foreground_mean"]["Dice"]
    )


def test_checkpoint_resume(nnunet_env):
    from dinounet_tpu.run import get_trainer_from_args

    make_png_dataset(str(nnunet_env / "raw"), n_cases=6, size=(72, 64))
    plans_identifier, _ = plan_and_preprocess(
        501, configurations=["2d"], num_processes=[1], verbose=False,
    )
    trainer = get_trainer_from_args(501, "2d", 0, "nnUNetTrainer", plans_identifier)
    trainer.num_epochs = 1
    trainer.num_iterations_per_epoch = 1
    trainer.num_val_iterations_per_epoch = 1
    trainer.run_training()

    ckpt_file = os.path.join(trainer.output_folder, "checkpoint_final.pth")
    trainer2 = get_trainer_from_args(501, "2d", 0, "nnUNetTrainer", plans_identifier)
    trainer2.num_epochs = 1
    trainer2.num_iterations_per_epoch = 1
    trainer2.load_checkpoint(ckpt_file)
    assert trainer2.current_epoch == 1
    # weights survived the round trip
    import jax

    leaves1 = jax.tree.leaves(trainer.variables["params"])
    leaves2 = jax.tree.leaves(trainer2.variables["params"])
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
