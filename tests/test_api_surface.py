"""API-surface parity checklist: every public symbol of the reference that a
user could reach has an equivalent here (SURVEY.md §2 inventory, enforced).

This is deliberately a static presence test — behavioral parity is covered by
the dedicated test modules (torch parity, golden planner tests, e2e drives).
"""

import importlib

import pytest

# (our module, [required symbols], reference citation)
SURFACE = [
    ("dinounet_tpu.api",
     ["plan_and_preprocess", "training", "evaluate"],
     "dinounet/api.py:270,399,590"),
    ("dinounet_tpu.planning.plan_and_preprocess_api",
     ["extract_fingerprints", "plan_experiments", "preprocess",
      "plan_and_preprocess_entry", "extract_fingerprint_entry",
      "plan_experiment_entry", "preprocess_entry"],
     "experiment_planning/plan_and_preprocess_api.py:35,80,146 + "
     "plan_and_preprocess_entrypoints.py:5,30,69,117"),
    ("dinounet_tpu.planning.fingerprint",
     ["DatasetFingerprintExtractor"],
     "dataset_fingerprint/fingerprint_extractor.py:18"),
    ("dinounet_tpu.planning.planner",
     ["ExperimentPlanner"],
     "experiment_planners/default_experiment_planner.py:24"),
    ("dinounet_tpu.planning.resenc_planner",
     ["ResEncUNetPlanner"],
     "experiment_planners/resencUNet_planner.py:14"),
    ("dinounet_tpu.planning.topology",
     ["get_pool_and_conv_props"],
     "experiment_planning/network_topology.py:30"),
    ("dinounet_tpu.planning.verify",
     ["verify_dataset_integrity"],
     "experiment_planning/verify_dataset_integrity.py:119"),
    ("dinounet_tpu.planning.move_plans_between_datasets",
     ["move_plans_between_datasets", "entry_point_move_plans_between_datasets"],
     "experiment_planning/plans_for_pretraining/move_plans_between_datasets.py:14,65"),
    ("dinounet_tpu.evaluation.metrics",
     ["compute_metrics_on_folder", "compute_metrics_on_folder2",
      "compute_metrics_on_folder_simple", "evaluate_folder_entry_point",
      "evaluate_simple_entry_point"],
     "evaluation/evaluate_predictions.py:238,305,327,343,361"),
    ("dinounet_tpu.evaluation.find_best_configuration",
     ["find_best_configuration", "find_best_configuration_entry_point",
      "accumulate_crossval_results_entry_point"],
     "evaluation/find_best_configuration.py:81,271,300"),
    ("dinounet_tpu.postprocessing.remove_connected_components",
     ["remove_all_but_largest_component_from_segmentation",
      "determine_postprocessing",
      "entry_point_determine_postprocessing_folder",
      "entry_point_apply_postprocessing"],
     "postprocessing/remove_connected_components.py:22,53,298,318"),
    ("dinounet_tpu.utilities.overlay_plots",
     ["entry_point_generate_overlay"],
     "utilities/overlay_plots.py:243"),
    ("dinounet_tpu.utilities.misc",
     ["get_output_folder", "folds_tuple_to_string", "folds_string_to_tuple",
      "convert_trainer_plans_config_to_identifier",
      "convert_identifier_to_trainer_plans_config",
      "generate_crossval_split", "maybe_convert_to_dataset_name"],
     "utilities/file_path_utilities.py:11-91, crossval_split.py:7, "
     "dataset_name_id_conversion.py:21"),
    ("dinounet_tpu.preprocessing.preprocessor",
     ["DefaultPreprocessor"],
     "preprocessing/preprocessors/default_preprocessor.py:33"),
    ("dinounet_tpu.preprocessing.cropping",
     ["crop_to_nonzero", "create_nonzero_mask"],
     "preprocessing/cropping.py:8,34"),
    ("dinounet_tpu.preprocessing.resampling",
     ["resample_data_or_seg_to_shape", "resample_data_or_seg_to_spacing",
      "compute_new_shape"],
     "preprocessing/resampling/default_resampling.py:32-216"),
    ("dinounet_tpu.preprocessing.normalization",
     ["ZScoreNormalization", "CTNormalization", "NoNormalization",
      "RescaleTo01Normalization", "RGBTo01Normalization"],
     "preprocessing/normalization/default_normalization_schemes.py:8-97"),
    ("dinounet_tpu.imageio.reader_writer_registry",
     ["determine_reader_writer_from_dataset_json",
      "determine_reader_writer_from_file_ending"],
     "imageio/reader_writer_registry.py:14-79"),
    ("dinounet_tpu.imageio.nifti", ["NiftiIO", "read_nifti", "write_nifti"],
     "imageio/{nibabel,simpleitk}_reader_writer.py (pure-python NIfTI here)"),
    ("dinounet_tpu.imageio.natural_image", ["NaturalImage2DIO"],
     "imageio/natural_image_reader_writer.py:22"),
    ("dinounet_tpu.imageio.tiff", ["Tiff3DIO"], "imageio/tif_reader_writer.py:23"),
    ("dinounet_tpu.models.dinounet",
     ["DinoUNet", "DinoUNetConfig", "DINOV3_MODEL_NAMES",
      "DINOV3_INTERACTION_INDEXES"],
     "dinounet_training.py:29-48,632-829"),
    ("dinounet_tpu.models.vit",
     ["DinoViT", "VIT_CONFIGS", "rope_sincos"],
     "dinov3/models/vision_transformer.py:55-412, hub/backbones.py"),
    ("dinounet_tpu.models.adapter",
     ["DINOv3Adapter", "MSDeformAttn", "SpatialPriorModule"],
     "dinov3/eval/segmentation/models/backbone/dinov3_adapter.py:305-484"),
    ("dinounet_tpu.models.fapm", ["FAPM", "FAPMEncoder"],
     "dinounet_training.py:355-514"),
    ("dinounet_tpu.models.decoder", ["UNetDecoder"],
     "dinounet_training.py:517-629"),
    ("dinounet_tpu.models.plain_unet", ["PlainConvUNet"],
     "utilities/get_network_from_plans.py:9 (arch registry)"),
    ("dinounet_tpu.models.residual_unet", ["ResidualEncoderUNet"],
     "resencUNet_planner.py network"),
    ("dinounet_tpu.models.convert",
     ["convert_torch_checkpoint", "convert_dinov3_state_dict",
      "load_dinov3_params_into"],
     "dinounet_training.py:51-75 (load_dinov3_model)"),
    ("dinounet_tpu.ops.msda", ["ms_deform_attn_core"],
     "ms_deform_attn.py:71-92"),
    ("dinounet_tpu.ops.msda_pallas", ["ms_deform_attn_pallas"],
     "ops/src/cuda/ms_deform_im2col_cuda.cuh"),
    ("dinounet_tpu.ops.attention_pallas", ["fused_rope_attention"],
     "dinov3/layers/attention.py:106-118"),
    ("dinounet_tpu.training.trainer", ["nnUNetTrainer"],
     "training/nnUNetTrainer/nnUNetTrainer.py:89"),
    ("dinounet_tpu.training.trainer_variants",
     ["nnUNetTrainerNoDeepSupervision", "nnUNetTrainer_1epoch",
      "nnUNetTrainer_8000epochs"],
     "nnUNetTrainerNoDeepSupervision.py:6, nnUNetTrainer_Xepochs.py"),
    ("dinounet_tpu.training.dinounet_trainer",
     ["DinoUNetTrainer", "DINOV3_TRAINERS", "get_dinov3_trainer"],
     "dinounet_training.py:833-956"),
    ("dinounet_tpu.training.losses",
     ["soft_dice_loss", "robust_cross_entropy", "topk_cross_entropy",
      "dc_and_ce_loss", "dc_and_bce_loss", "dc_and_topk_loss",
      "deep_supervision_weights", "deep_supervision_loss", "get_tp_fp_fn_tn"],
     "training/loss/{dice,robust_ce_loss,compound_losses,deep_supervision}.py"
     " (functional jax equivalents of the torch loss classes)"),
    ("dinounet_tpu.training.lr_scheduler", ["poly_lr"],
     "training/lr_scheduler/polylr.py:4 (PolyLRScheduler as a pure function)"),
    ("dinounet_tpu.training.logger", ["nnUNetLogger"],
     "training/logging/nnunet_logger.py:9"),
    ("dinounet_tpu.training.dataloading",
     ["nnUNetDataset", "nnUNetDataLoader2D", "nnUNetDataLoader3D",
      "unpack_dataset"],
     "training/dataloading/"),
    ("dinounet_tpu.run",
     ["run_training", "get_trainer_from_args", "maybe_load_checkpoint",
      "load_pretrained_weights", "run_training_entry"],
     "dinounet/run/run_training.py:31-277, load_pretrained_weights.py:6"),
    ("dinounet_tpu.inference.predictor",
     ["nnUNetPredictor", "predict_entry_point",
      "predict_entry_point_modelfolder"],
     "inference/predict_from_raw_data.py:38,779,873"),
    ("dinounet_tpu.inference.sliding_window",
     ["compute_gaussian", "compute_steps_for_sliding_window", "pad_nd_image",
      "predict_sliding_window_return_logits",
      "predict_sliding_window_return_logits_with_target"],
     "inference/sliding_window_prediction.py:10-56, predict_from_raw_data.py:503-776"),
    ("dinounet_tpu.inference.export",
     ["export_prediction_from_logits",
      "convert_predicted_logits_to_segmentation_with_correct_shape",
      "resample_and_save"],
     "inference/export_prediction.py:15-145"),
    ("dinounet_tpu.evaluation.metrics",
     ["compute_metrics_on_folder", "compute_metrics_on_folder2",
      "save_summary_json", "load_summary_json"],
     "evaluation/evaluate_predictions.py:42-305"),
    ("dinounet_tpu.evaluation.find_best_configuration",
     ["find_best_configuration"],
     "evaluation/find_best_configuration.py:81"),
    ("dinounet_tpu.evaluation.accumulate_cv_results",
     ["accumulate_cv_results"],
     "evaluation/accumulate_cv_results.py:12"),
    ("dinounet_tpu.postprocessing.remove_connected_components",
     ["remove_all_but_largest_component_from_segmentation",
      "determine_postprocessing", "apply_postprocessing_to_folder"],
     "postprocessing/remove_connected_components.py:22,53,248"),
    ("dinounet_tpu.ensembling.ensemble",
     ["ensemble_folders", "ensemble_crossvalidations",
      "average_probabilities", "merge_files"],
     "ensembling/ensemble.py:17-206"),
    ("dinounet_tpu.utilities.plans_handler",
     ["PlansManager", "ConfigurationManager"],
     "utilities/plans_handling/plans_handler.py:31,228"),
    ("dinounet_tpu.utilities.label_handling",
     ["LabelManager", "convert_labelmap_to_one_hot",
      "determine_num_input_channels"],
     "utilities/label_handling/label_handling.py:21,248,283"),
    ("dinounet_tpu.utilities.overlay_plots",
     ["generate_overlay", "plot_overlay"],
     "utilities/overlay_plots.py:53-180"),
    ("dinounet_tpu.parallel",
     ["make_mesh", "batch_sharding", "param_shardings",
      "multihost_initialize"],
     "run/run_training.py:104-194 (DDP), dinov3/distributed/ (dormant)"),
    ("dinounet_tpu.paths",
     ["nnUNet_raw", "nnUNet_preprocessed", "nnUNet_results"],
     "dinounet/paths.py:21-23"),
]


@pytest.mark.parametrize("module,symbols,citation",
                         SURFACE, ids=[m for m, _, _ in SURFACE])
def test_surface(module, symbols, citation):
    mod = importlib.import_module(module)
    missing = [s for s in symbols if not hasattr(mod, s)]
    assert not missing, (
        f"{module} is missing {missing} (reference: {citation})")


def test_evaluate_prediction_routing(tmp_path, monkeypatch):
    # (test name must not contain "fold": the reference parses the fold id by
    # "fold_" substring anywhere in the path — api.py:619-620 — and pytest
    # puts the test name into tmp_path)
    """evaluate()'s gt/pred/plans resolution (ref api.py:609-639): fold given ->
    result_folder/validation; fold=None parses fold_N from the path; fold=None
    without fold_N in the path -> test_predictions; plans identifier comes from
    the <Trainer>__<plans>__<config> folder name."""
    import json
    import os

    from dinounet_tpu import api
    from dinounet_tpu.evaluation import metrics as m

    ds = "Dataset509_Routing"
    prep = tmp_path / "preprocessed" / ds
    prep.mkdir(parents=True)
    (prep / "dataset.json").write_text("{}")
    (prep / "myplans.json").write_text("{}")
    monkeypatch.setenv("nnUNet_preprocessed", str(tmp_path / "preprocessed"))

    res = tmp_path / "results" / ds / "TrainerA__myplans__2d" / "fold_0"
    for sub in ("validation", "test_predictions"):
        (res / sub).mkdir(parents=True, exist_ok=True)

    calls = []
    monkeypatch.setattr(
        m, "compute_metrics_on_folder2",
        lambda gt, pred, dsj, plans, output_file=None, num_processes=8,
        chill=True: calls.append((gt, pred, plans)))
    monkeypatch.setattr(m, "load_summary_json", lambda f: {"ok": True})

    out = api.evaluate(509, str(res))  # fold defaults to 0
    assert out == {"ok": True}
    gt, pred, plans = calls[-1]
    assert gt.endswith("gt_segmentations")
    assert pred == str(res / "validation")
    assert plans == str(prep / "myplans.json")

    api.evaluate(509, str(res), fold=None)  # fold parsed from .../fold_0
    assert calls[-1][1] == str(res / "validation")

    nofold = tmp_path / "results" / ds / "TrainerA__myplans__2d"
    (nofold / "test_predictions").mkdir(parents=True, exist_ok=True)
    api.evaluate(509, str(nofold), fold=None)
    assert calls[-1][1] == str(nofold / "test_predictions")
    assert calls[-1][2] == str(prep / "myplans.json")
