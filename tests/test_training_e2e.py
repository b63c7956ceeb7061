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


class TestAugment3D:
    def test_shapes_and_labels(self):
        import jax
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import (
            AugmentConfig3D,
            augment_batch_3d,
            get_enlarged_patch_size_3d,
        )

        final = (8, 12, 12)
        init = get_enlarged_patch_size_3d(final, [0.5236] * 3, (0.85, 1.25))
        assert all(i >= f for i, f in zip(init, final))

        cfg = AugmentConfig3D(patch_size=final)
        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.standard_normal((2, *init, 1)), jnp.float32)
        seg = jnp.asarray(rng.integers(0, 3, (2, *init)), jnp.int32)
        x, s = augment_batch_3d(jax.random.PRNGKey(0), data, seg, cfg)
        assert x.shape == (2, *final, 1)
        assert s.shape == (2, *final)
        assert int(s.min()) >= 0  # -1 fill cleaned up
        assert np.isfinite(np.asarray(x)).all()

    def test_identity_when_disabled(self):
        import jax
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import (
            AugmentConfig3D,
            augment_batch_3d,
        )

        shape = (6, 10, 10)
        cfg = AugmentConfig3D(
            patch_size=shape, p_rotation=0.0, p_scale=0.0, p_noise=0.0,
            p_blur=0.0, p_brightness=0.0, p_contrast=0.0, p_gamma=0.0,
            p_gamma_invert=0.0, mirror_axes=())
        rng = np.random.default_rng(1)
        data = jnp.asarray(rng.standard_normal((1, *shape, 2)), jnp.float32)
        seg = jnp.asarray(rng.integers(0, 2, (1, *shape)), jnp.int32)
        x, s = augment_batch_3d(jax.random.PRNGKey(3), data, seg, cfg)
        np.testing.assert_allclose(np.asarray(x), np.asarray(data), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(s), np.asarray(seg))

    def test_dummy_2d_rotation_preserves_z(self):
        """In-plane-only rotation (anisotropic/dummy-2d) must not mix z slices."""
        import jax
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import (
            AugmentConfig3D,
            augment_batch_3d,
        )

        shape = (4, 16, 16)
        cfg = AugmentConfig3D(
            patch_size=shape, p_rotation=1.0,
            rotation_ranges=((-np.pi, np.pi), (0.0, 0.0), (0.0, 0.0)),
            p_scale=0.0, p_noise=0.0, p_blur=0.0, p_brightness=0.0,
            p_contrast=0.0, p_gamma=0.0, p_gamma_invert=0.0, mirror_axes=())
        # per-slice constant volume: any in-plane rotation keeps slices constant
        base = np.zeros((1, *shape, 1), np.float32)
        for z in range(shape[0]):
            base[0, z] = float(z)
        data = jnp.asarray(base)
        seg = jnp.zeros((1, *shape), jnp.int32)
        x, _ = augment_batch_3d(jax.random.PRNGKey(7), data, seg, cfg)
        x = np.asarray(x)[0, ..., 0]
        for z in range(shape[0]):
            interior = x[z, 4:-4, 4:-4]  # borders may sample the zero fill
            np.testing.assert_allclose(interior, float(z), atol=1e-4)


class TestRemoveRandomComponent:
    """remove_random_component: exact on-device connected-component removal
    (ref: cascade_transforms.py RemoveRandomConnectedComponentFromOneHot...,
    p_per_sample 0.2 / max covered 0.15 at nnUNetTrainer.py:754-759)."""

    def _mask_with_components(self, rng, shape=(24, 24), n_blobs=4):
        import scipy.ndimage as ndi

        m = np.zeros(shape, np.float32)
        for _ in range(n_blobs):
            y, x = rng.integers(2, shape[0] - 5), rng.integers(2, shape[1] - 5)
            m[y:y + rng.integers(2, 4), x:x + rng.integers(2, 4)] = 1.0
        lab, n = ndi.label(m)  # default 4-connectivity, like the reference
        return m, lab, n

    def test_flood_fill_matches_scipy_component(self):
        import jax
        import jax.numpy as jnp
        import scipy.ndimage as ndi

        from dinounet_tpu.training.augmentation import component_of_seed

        rng = np.random.default_rng(3)
        for trial in range(5):
            m, lab, n = self._mask_with_components(rng)
            if n == 0:
                continue
            fg = np.argwhere(m > 0)
            sy, sx = fg[rng.integers(len(fg))]
            seed = np.zeros_like(m)
            seed[sy, sx] = 1.0
            comp = np.asarray(component_of_seed(jnp.asarray(m), jnp.asarray(seed)))
            expected = (lab == lab[sy, sx]).astype(np.float32)
            np.testing.assert_array_equal(comp, expected)

    def test_flood_fill_3d(self):
        import jax.numpy as jnp
        import scipy.ndimage as ndi

        from dinounet_tpu.training.augmentation import component_of_seed

        m = np.zeros((8, 8, 8), np.float32)
        m[1:3, 1:3, 1:3] = 1.0
        m[5:7, 5:7, 5:7] = 1.0
        seed = np.zeros_like(m)
        seed[1, 1, 1] = 1.0
        comp = np.asarray(component_of_seed(jnp.asarray(m), jnp.asarray(seed)))
        lab, _ = ndi.label(m)
        np.testing.assert_array_equal(comp, (lab == lab[1, 1, 1]))

    def test_removes_exactly_one_full_component(self):
        import jax
        import jax.numpy as jnp
        import scipy.ndimage as ndi

        from dinounet_tpu.training.augmentation import remove_random_component

        rng = np.random.default_rng(7)
        m, lab, n = self._mask_with_components(rng)
        assert n >= 2
        onehot = jnp.asarray(m)[..., None]
        out = np.asarray(remove_random_component(
            jax.random.PRNGKey(1), onehot, p_per_sample=1.0))[..., 0]
        removed = m - out
        assert removed.min() >= 0  # only removals
        # the removed region is exactly one scipy-labelled component
        ids = np.unique(lab[removed > 0])
        assert len(ids) == 1
        np.testing.assert_array_equal(removed > 0, lab == ids[0])

    def test_oversized_component_is_kept(self):
        import jax
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import remove_random_component

        m = np.zeros((16, 16), np.float32)
        m[2:14, 2:14] = 1.0  # 144/256 = 56% > 15% cap
        out = np.asarray(remove_random_component(
            jax.random.PRNGKey(0), jnp.asarray(m)[..., None], p_per_sample=1.0))
        np.testing.assert_array_equal(out[..., 0], m)

    def test_fill_with_other_class(self):
        import jax
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import remove_random_component

        oh = np.zeros((16, 16, 2), np.float32)
        oh[3:5, 3:5, 0] = 1.0
        # channels are processed sequentially on the mutated data (reference
        # semantics: data[b, c] loop in cascade_transforms.py:62-83), so with
        # fill p=1 the region ping-pongs between channels but is conserved
        # pixelwise across the channel union; with fill p=0 it is dropped.
        out_fill = np.asarray(remove_random_component(
            jax.random.PRNGKey(2), jnp.asarray(oh), p_per_sample=1.0,
            fill_with_other_class_p=1.0))
        np.testing.assert_array_equal(out_fill.max(-1), oh.max(-1))
        out_nofill = np.asarray(remove_random_component(
            jax.random.PRNGKey(2), jnp.asarray(oh), p_per_sample=1.0,
            fill_with_other_class_p=0.0))
        np.testing.assert_array_equal(out_nofill, 0.0)

    def test_vmapped_under_jit(self):
        import jax
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import remove_random_component

        oh = np.zeros((2, 12, 12, 1), np.float32)
        oh[0, 2:4, 2:4, 0] = 1.0
        oh[1, 5:9, 5:9, 0] = 1.0
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        f = jax.jit(jax.vmap(
            lambda k, x: remove_random_component(k, x, p_per_sample=1.0)))
        out = np.asarray(f(keys, jnp.asarray(oh)))
        assert out.shape == oh.shape
        assert set(np.unique(out)).issubset({0.0, 1.0})


class TestCascadeAugment:
    def test_onehot_shapes_and_identity(self):
        import jax
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import cascade_onehot_augment

        prev = jnp.asarray(np.random.default_rng(0).integers(0, 3, (12, 12)),
                           jnp.int32)
        out = cascade_onehot_augment(jax.random.PRNGKey(0), prev, (1, 2),
                                     p_binary_op=0.0, p_remove_component=0.0)
        assert out.shape == (12, 12, 2)
        np.testing.assert_array_equal(np.asarray(out[..., 0]),
                                      np.asarray(prev == 1).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(out[..., 1]),
                                      np.asarray(prev == 2).astype(np.float32))

    def test_morph_changes_mask(self):
        import jax
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import cascade_onehot_augment

        prev = np.zeros((16, 16), np.int32)
        prev[7:9, 7:9] = 1
        prev = jnp.asarray(prev)
        # p=1: every channel gets some random morphological op; the result must
        # stay binary and differ from identity for at least one seed
        changed = False
        for seed in range(6):
            out = np.asarray(cascade_onehot_augment(
                jax.random.PRNGKey(seed), prev, (1,), p_binary_op=1.0)[..., 0])
            assert set(np.unique(out)).issubset({0.0, 1.0})
            if not np.array_equal(out, np.asarray(prev == 1, np.float32)):
                changed = True
        assert changed


def test_trainer_gspmd_model_axis(tmp_path, monkeypatch):
    """The real trainer on a ('data','model') = (4,2) CPU mesh: GSPMD batch
    sharding + committed param shardings + batch rounding to the data axis."""
    import jax

    from dinounet_tpu.planning.plan_and_preprocess_api import (
        extract_fingerprints,
        plan_experiments,
        preprocess,
    )
    from dinounet_tpu.run import get_trainer_from_args
    from helpers import make_png_dataset

    for sub in ("raw", "pre", "res"):
        (tmp_path / sub).mkdir()
    monkeypatch.setenv("nnUNet_raw", str(tmp_path / "raw"))
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("nnUNet_results", str(tmp_path / "res"))
    monkeypatch.setenv("DINOUNET_TPU_MODEL_AXIS", "2")
    monkeypatch.setenv("DINOUNET_TPU_PLATFORM", "cpu")

    make_png_dataset(str(tmp_path / "raw"), "Dataset601_Gspmd", n_cases=8,
                     size=(48, 40))
    extract_fingerprints([601], verbose=False)
    pid = plan_experiments([601])
    preprocess([601], pid, ["2d"], [1], False)

    trainer = get_trainer_from_args(601, "2d", 0, "nnUNetTrainer", pid)
    trainer.num_iterations_per_epoch = 2
    trainer.num_val_iterations_per_epoch = 1
    trainer.num_epochs = 1
    assert trainer.mesh.shape["model"] == 2
    assert trainer.mesh.shape["data"] == 4
    trainer.run_training()
    assert np.isfinite(trainer.logger.my_fantastic_logging["train_losses"][-1])

    # model-sharded runs write orbax per-shard checkpoint DIRECTORIES (the 7B
    # path: no single-host gather), and the resume chain loads them back
    import os

    final = os.path.join(trainer.output_folder, "checkpoint_final.pth")
    assert os.path.isdir(final), "model-axis>1 should produce a sharded ckpt"
    from dinounet_tpu.training.checkpointing import load_checkpoint

    ckpt = load_checkpoint(final)
    assert ckpt["trainer_name"] == "nnUNetTrainer"
    assert "network_weights" in ckpt
    trainer2 = get_trainer_from_args(601, "2d", 0, "nnUNetTrainer", pid)
    trainer2.num_epochs = 1
    trainer2.load_checkpoint(final)
    assert trainer2.current_epoch == 1
    # the sharded restore must place arrays straight onto the mesh (template
    # path) rather than materializing a gathered copy on one device — the
    # whole point of the orbax format for a 14 GB 7B state
    from jax.sharding import NamedSharding

    for leaf in jax.tree.leaves(trainer2.variables["params"]):
        assert isinstance(leaf, jax.Array)
        assert isinstance(leaf.sharding, NamedSharding)
        assert leaf.sharding.mesh.shape["model"] == 2
    for r, g in zip(jax.tree.leaves(trainer.variables["params"]),
                    jax.tree.leaves(trainer2.variables["params"])):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g))
    opt_leaves = jax.tree.leaves(trainer2.opt_state)
    assert all(isinstance(x, jax.Array) for x in opt_leaves)


def test_trainer_3d_smoke(tmp_path, monkeypatch):
    """3-D training path: 3d_fullres plans, volumetric loader, on-device 3-D
    augmentation inside the train step."""
    import jax

    from dinounet_tpu.planning.plan_and_preprocess_api import (
        extract_fingerprints,
        plan_experiments,
        preprocess,
    )
    from dinounet_tpu.run import get_trainer_from_args
    from helpers import make_nifti_dataset

    for sub in ("raw", "pre", "res"):
        (tmp_path / sub).mkdir()
    monkeypatch.setenv("nnUNet_raw", str(tmp_path / "raw"))
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("nnUNet_results", str(tmp_path / "res"))
    monkeypatch.setenv("DINOUNET_TPU_PLATFORM", "cpu")

    make_nifti_dataset(str(tmp_path / "raw"), "Dataset602_Toy3dTrain", n_cases=6,
                       size=(20, 24, 24))
    extract_fingerprints([602], verbose=False)
    pid = plan_experiments([602])
    preprocess([602], pid, ["3d_fullres"], [1], False)

    trainer = get_trainer_from_args(602, "3d_fullres", 0, "nnUNetTrainer", pid)
    trainer.num_iterations_per_epoch = 2
    trainer.num_val_iterations_per_epoch = 1
    trainer.num_epochs = 1
    trainer.run_training()
    assert np.isfinite(trainer.logger.my_fantastic_logging["train_losses"][-1])

    # full validation drives the 3-D sliding-window inference + export chain
    metrics = trainer.perform_actual_validation()
    assert metrics is not None and np.isfinite(metrics["foreground_mean"]["Dice"])


def test_cascade_end_to_end(tmp_path, monkeypatch):
    """Full cascade chain (ref nnU-Net 3d_lowres -> 3d_cascade_fullres):
    train the lowres stage, export next-stage predictions during its
    validation, then train + validate the cascade stage consuming them as
    one-hot input channels."""
    import jax

    from dinounet_tpu.planning.plan_and_preprocess_api import (
        extract_fingerprints,
        plan_experiments,
        preprocess,
    )
    from dinounet_tpu.run import get_trainer_from_args
    from dinounet_tpu.utilities.json_export import load_json, save_json
    from helpers import make_nifti_dataset

    for sub in ("raw", "pre", "res"):
        (tmp_path / sub).mkdir()
    monkeypatch.setenv("nnUNet_raw", str(tmp_path / "raw"))
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("nnUNet_results", str(tmp_path / "res"))
    monkeypatch.setenv("DINOUNET_TPU_PLATFORM", "cpu")

    make_nifti_dataset(str(tmp_path / "raw"), "Dataset603_Casc", n_cases=6,
                       size=(20, 24, 24))
    extract_fingerprints([603], verbose=False)
    pid = plan_experiments([603])

    # The toy volume is too small for the planner to emit a lowres stage on
    # its own; wire the cascade pair by hand (same mechanism, tiny shapes).
    plans_file = tmp_path / "pre" / "Dataset603_Casc" / f"{pid}.json"
    plans = load_json(str(plans_file))
    plans["configurations"]["3d_lowres"] = dict(
        plans["configurations"]["3d_fullres"],
        next_stage="3d_cascade_fullres",
    )
    plans["configurations"]["3d_cascade_fullres"] = {
        "inherits_from": "3d_fullres",
        "previous_stage": "3d_lowres",
    }
    save_json(plans, str(plans_file))
    preprocess([603], pid, ["3d_fullres", "3d_lowres"], [1, 1], False)

    def short(trainer):
        trainer.num_iterations_per_epoch = 2
        trainer.num_val_iterations_per_epoch = 1
        trainer.num_epochs = 1
        return trainer

    # stage 1: lowres; validation exports predicted_next_stage/<cascade>
    tr1 = short(get_trainer_from_args(603, "3d_lowres", 0, "nnUNetTrainer", pid))
    tr1.run_training()
    tr1.perform_actual_validation()
    next_stage_dir = os.path.join(tr1.output_folder_base, "predicted_next_stage",
                                  "3d_cascade_fullres")
    assert os.path.isdir(next_stage_dir)
    exported = [f for f in os.listdir(next_stage_dir) if f.endswith(".npz")]
    assert exported, "lowres validation must export next-stage predictions"

    # the cascade trainer reads prev-stage predictions for ALL its cases; the
    # lowres stage only validated fold-0's val split, so fill in the rest by
    # copying (content is irrelevant for the mechanism test)
    tr2 = short(get_trainer_from_args(603, "3d_cascade_fullres", 0,
                                      "nnUNetTrainer", pid))
    import shutil

    all_cases = [f[:-4] for f in os.listdir(
        tr2.preprocessed_dataset_folder) if f.endswith(".npz")]
    for c in all_cases:
        dst = os.path.join(next_stage_dir, c + ".npz")
        if not os.path.isfile(dst):
            shutil.copy(os.path.join(next_stage_dir, exported[0]), dst)

    assert tr2.is_cascaded
    assert tr2.folder_with_segs_from_previous_stage == next_stage_dir
    tr2.run_training()
    metrics = tr2.perform_actual_validation()
    assert metrics is not None and np.isfinite(metrics["foreground_mean"]["Dice"])


def test_predictor_from_trained_folder(nnunet_env):
    """nnUNetPredictor restored from a results folder: fold ensembling over
    two trained folds, predict_from_files on raw images, num_parts sharding,
    and overwrite skipping (ref predict_from_raw_data.py:67-427)."""
    from dinounet_tpu.inference.predictor import nnUNetPredictor
    from dinounet_tpu.run import get_trainer_from_args

    make_png_dataset(str(nnunet_env / "raw"), n_cases=6, size=(72, 64))
    plans_identifier, _ = plan_and_preprocess(
        501, configurations=["2d"], num_processes=[1], verbose=False,
    )
    for fold in (0, 1):
        tr = get_trainer_from_args(501, "2d", fold, "nnUNetTrainer", plans_identifier)
        tr.num_epochs = 1
        tr.num_iterations_per_epoch = 1
        tr.num_val_iterations_per_epoch = 1
        tr.run_training()
    model_folder = tr.output_folder_base

    predictor = nnUNetPredictor(tile_step_size=0.5, use_mirroring=True)
    predictor.initialize_from_trained_model_folder(
        model_folder, use_folds=None, checkpoint_name="checkpoint_final.pth")
    # auto-detected both folds -> logits averaged over 2 checkpoints
    assert len(predictor.list_of_parameters) == 2

    in_folder = str(nnunet_env / "raw" / "Dataset501_Toy2d" / "imagesTr")
    out_folder = str(nnunet_env / "preds")
    predictor.predict_from_files(in_folder, out_folder)
    preds = sorted(f for f in os.listdir(out_folder) if f.endswith(".png"))
    assert len(preds) == 6
    assert os.path.isfile(os.path.join(out_folder, "dataset.json"))
    assert os.path.isfile(os.path.join(out_folder, "plans.json"))

    # num_parts sharding: part 0 of 2 handles half the work
    out2 = str(nnunet_env / "preds_part0")
    predictor.predict_from_files(in_folder, out2, num_parts=2, part_id=0)
    part_preds = [f for f in os.listdir(out2) if f.endswith(".png")]
    assert len(part_preds) == 3

    # overwrite=False skips everything already predicted
    ret = predictor.predict_from_files(in_folder, out_folder, overwrite=False)
    assert ret == []

    # predict_single_npy_array round trip (ref :429-464)
    from dinounet_tpu.utilities.plans_handler import PlansManager

    rw = predictor.plans_manager.image_reader_writer_class()
    img, props = rw.read_images(
        (os.path.join(in_folder, "case_000_0000.png"),))
    seg = predictor.predict_single_npy_array(img, props)
    assert seg.shape == tuple(img.shape[1:])
    assert set(np.unique(seg)).issubset({0, 1, 2})

    # the nnUNetv2_predict-style CLIs on the same trained folder
    import sys

    from dinounet_tpu.inference.predictor import (
        predict_entry_point,
        predict_entry_point_modelfolder,
    )

    out_cli = str(nnunet_env / "preds_cli")
    argv = sys.argv
    try:
        sys.argv = ["nnUNetv2_predict", "-i", in_folder, "-o", out_cli,
                    "-d", "501", "-c", "2d", "-f", "0", "1", "--disable_tta"]
        predict_entry_point()
        assert len([f for f in os.listdir(out_cli) if f.endswith(".png")]) == 6

        out_cli2 = str(nnunet_env / "preds_cli_mf")
        sys.argv = ["nnUNetv2_predict_from_modelfolder", "-i", in_folder,
                    "-o", out_cli2, "-m", model_folder, "-f", "0",
                    "--disable_tta"]
        predict_entry_point_modelfolder()
        assert len([f for f in os.listdir(out_cli2) if f.endswith(".png")]) == 6
    finally:
        sys.argv = argv


def test_region_based_training(tmp_path, monkeypatch):
    """Region-based training (overlapping targets + sigmoid/BCE, ref
    nnUNetTrainer region branch :963-1008 and ConvertSegmentationToRegions):
    labels declared as regions train and validate end-to-end."""
    import jax

    from dinounet_tpu.planning.plan_and_preprocess_api import (
        extract_fingerprints,
        plan_experiments,
        preprocess,
    )
    from dinounet_tpu.run import get_trainer_from_args
    from dinounet_tpu.utilities.json_export import load_json, save_json
    from helpers import make_png_dataset

    for sub in ("raw", "pre", "res"):
        (tmp_path / sub).mkdir()
    monkeypatch.setenv("nnUNet_raw", str(tmp_path / "raw"))
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("nnUNet_results", str(tmp_path / "res"))
    monkeypatch.setenv("DINOUNET_TPU_PLATFORM", "cpu")

    make_png_dataset(str(tmp_path / "raw"), "Dataset604_Regions", n_cases=6,
                     size=(48, 40), n_classes=3)
    # declare overlapping regions: 'whole' = {1,2}, 'inner' = {2}
    dsj_file = tmp_path / "raw" / "Dataset604_Regions" / "dataset.json"
    dsj = load_json(str(dsj_file))
    dsj["labels"] = {"background": 0, "whole": [1, 2], "inner": [2]}
    dsj["regions_class_order"] = [1, 2]
    save_json(dsj, str(dsj_file))

    extract_fingerprints([604], verbose=False)
    pid = plan_experiments([604])
    preprocess([604], pid, ["2d"], [1], False)

    trainer = get_trainer_from_args(604, "2d", 0, "nnUNetTrainer", pid)
    assert trainer.label_manager.has_regions
    trainer.num_iterations_per_epoch = 2
    trainer.num_val_iterations_per_epoch = 1
    trainer.num_epochs = 1
    trainer.run_training()
    assert np.isfinite(trainer.logger.my_fantastic_logging["train_losses"][-1])
    # region pseudo-dice: one entry per region
    assert len(trainer.logger.my_fantastic_logging[
        "dice_per_class_or_region"][-1]) == 2

    # sliding-window validation exports via regions_class_order thresholding
    metrics = trainer.perform_actual_validation()
    assert metrics is not None


def test_dummy2d_scale_preserves_z():
    """In-plane-only scaling (dummy-2d) must not resample across z slices."""
    import jax
    import jax.numpy as jnp

    from dinounet_tpu.training.augmentation import (
        AugmentConfig3D,
        augment_batch_3d,
    )

    shape = (4, 16, 16)
    cfg = AugmentConfig3D(
        patch_size=shape, p_rotation=0.0, p_scale=1.0, scale_range=(1.3, 1.4),
        scale_in_plane_only=True, p_noise=0.0, p_blur=0.0, p_brightness=0.0,
        p_contrast=0.0, p_gamma=0.0, p_gamma_invert=0.0, mirror_axes=())
    base = np.zeros((1, *shape, 1), np.float32)
    for z in range(shape[0]):
        base[0, z] = float(z)
    x, _ = augment_batch_3d(jax.random.PRNGKey(0), jnp.asarray(base),
                            jnp.zeros((1, *shape), jnp.int32), cfg)
    x = np.asarray(x)[0, ..., 0]
    for z in range(shape[0]):
        interior = x[z, 6:-6, 6:-6]
        np.testing.assert_allclose(interior, float(z), atol=1e-4)


def test_batch_prefetcher():
    """The trainer's background batch thread delivers batches in order and
    surfaces loader exceptions to the consumer."""
    import time as _time

    from dinounet_tpu.training.trainer import nnUNetTrainer

    class Loader:
        def __init__(self):
            self.i = 0

        def generate_train_batch(self):
            self.i += 1
            if self.i > 5:
                raise ValueError("boom")
            return {"n": self.i}

    pf = nnUNetTrainer._BatchPrefetcher(Loader())
    got = [pf.next()["n"] for _ in range(5)]
    assert got == [1, 2, 3, 4, 5]
    try:
        pf.next()
        raise AssertionError("expected the loader exception to surface")
    except ValueError as e:
        assert "boom" in str(e)
    pf.close()

    # close() while the producer is blocked on a full queue must not hang
    class Slow:
        def generate_train_batch(self):
            return {"x": 1}

    pf2 = nnUNetTrainer._BatchPrefetcher(Slow())
    _time.sleep(0.3)  # queue fills
    pf2.close()


class TestCubicWarp:
    """Optional order-3 (Catmull-Rom) data warp (AugmentConfig.data_interp_order=3),
    the on-device equivalent of the reference's batchgenerators order_data=3."""

    def test_identity_transform_exact(self, rng):
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import _cubic_sample

        img = jnp.asarray(rng.standard_normal((12, 14, 2)), jnp.float32)
        yy, xx = jnp.meshgrid(jnp.arange(12.0), jnp.arange(14.0), indexing="ij")
        out = _cubic_sample(img, yy, xx, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   rtol=1e-5, atol=1e-5)

    def test_linear_ramp_reproduced(self):
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import _cubic_sample

        # Catmull-Rom reproduces linear functions exactly (away from borders)
        yy, xx = jnp.meshgrid(jnp.arange(16.0), jnp.arange(16.0), indexing="ij")
        img = (2.0 * yy + 3.0 * xx)[..., None]
        sy = yy[2:-3, 2:-3] + 0.37
        sx = xx[2:-3, 2:-3] + 0.61
        out = _cubic_sample(img, sy, sx, 0.0)
        expect = 2.0 * sy + 3.0 * sx
        np.testing.assert_allclose(np.asarray(out[..., 0]), np.asarray(expect),
                                   rtol=1e-5, atol=1e-4)

    def test_order3_config_runs_through_pipeline(self, rng):
        import jax
        import jax.numpy as jnp

        from dinounet_tpu.training.augmentation import (
            AugmentConfig,
            augment_batch_2d,
        )

        cfg = AugmentConfig(patch_size=(16, 16), data_interp_order=3)
        data = jnp.asarray(rng.standard_normal((2, 24, 24, 1)), jnp.float32)
        seg = jnp.asarray(rng.integers(0, 3, (2, 24, 24)), jnp.int32)
        x, s = augment_batch_2d(jax.random.PRNGKey(0), data, seg, cfg)
        assert x.shape == (2, 16, 16, 1)
        assert s.shape == (2, 16, 16)
        assert np.isfinite(np.asarray(x)).all()
