"""Plan-and-preprocess orchestration.

Capability parity with ref: dinounet/experiment_planning/plan_and_preprocess_api.py
(:17-152): fingerprint extraction, experiment planning, preprocessing over
configurations, and the gt_segmentations copy used by evaluation.
"""

import os
import shutil
from typing import List, Optional, Tuple, Union

from dinounet_tpu import paths
from dinounet_tpu.planning.dataset_utils import get_filenames_of_train_images_and_targets
from dinounet_tpu.planning.fingerprint import DatasetFingerprintExtractor
from dinounet_tpu.planning.planner import ExperimentPlanner
from dinounet_tpu.planning.verify import verify_dataset_integrity
from dinounet_tpu.utilities.json_export import load_json
from dinounet_tpu.utilities.misc import maybe_convert_to_dataset_name
from dinounet_tpu.utilities.plans_handler import PlansManager


def extract_fingerprint_dataset(dataset_id: Union[int, str],
                                fingerprint_extractor_class=DatasetFingerprintExtractor,
                                num_processes: int = 8, check_dataset_integrity: bool = False,
                                clean: bool = True, verbose: bool = True) -> dict:
    dataset_name = maybe_convert_to_dataset_name(dataset_id)
    if check_dataset_integrity:
        verify_dataset_integrity(os.path.join(paths.nnUNet_raw(), dataset_name), num_processes)
    fpe = fingerprint_extractor_class(dataset_id, num_processes, verbose=verbose)
    return fpe.run(overwrite_existing=clean)


def extract_fingerprints(dataset_ids: List[int], num_processes: int = 8,
                         check_dataset_integrity: bool = False, clean: bool = True,
                         verbose: bool = True):
    for d in dataset_ids:
        extract_fingerprint_dataset(
            d, num_processes=num_processes, check_dataset_integrity=check_dataset_integrity,
            clean=clean, verbose=verbose,
        )


def plan_experiment_dataset(dataset_id: Union[int, str],
                            experiment_planner_class=ExperimentPlanner,
                            gpu_memory_target_in_gb: float = 8,
                            preprocess_class_name: str = "DefaultPreprocessor",
                            overwrite_target_spacing=None,
                            overwrite_plans_name: Optional[str] = None,
                            force_target_shape=None, max_batch_size: int = 32,
                            force_n_stages: Optional[int] = None) -> Tuple[dict, str]:
    kwargs = {}
    if overwrite_plans_name is not None:
        kwargs["plans_name"] = overwrite_plans_name
    planner = experiment_planner_class(
        dataset_id, gpu_memory_target_in_gb=gpu_memory_target_in_gb,
        preprocessor_name=preprocess_class_name,
        overwrite_target_spacing=(
            [float(i) for i in overwrite_target_spacing]
            if overwrite_target_spacing is not None else None
        ),
        force_target_shape=force_target_shape, max_batch_size=max_batch_size,
        force_n_stages=force_n_stages, **kwargs,
    )
    plans = planner.plan_experiment()
    return plans, planner.plans_identifier


def plan_experiments(dataset_ids: List[int], **kwargs):
    plans_identifier = None
    for d in dataset_ids:
        _, plans_identifier = plan_experiment_dataset(d, **kwargs)
    return plans_identifier


def preprocess_dataset(dataset_id: Union[int, str], plans_identifier: str = "nnUNetPlans",
                       configurations=("2d", "3d_fullres", "3d_lowres"),
                       num_processes=(8, 4, 8), verbose: bool = False) -> None:
    if isinstance(num_processes, int):
        num_processes = [num_processes]
    num_processes = list(num_processes)
    if len(num_processes) == 1:
        num_processes = num_processes * len(configurations)
    if len(num_processes) != len(configurations):
        raise RuntimeError(
            "num_processes must have length 1 or match the number of configurations"
        )

    dataset_name = maybe_convert_to_dataset_name(dataset_id)
    plans_file = os.path.join(paths.nnUNet_preprocessed(), dataset_name,
                              plans_identifier + ".json")
    plans_manager = PlansManager(plans_file)
    for n, c in zip(num_processes, configurations):
        if c not in plans_manager.available_configurations:
            print(f"INFO: Configuration {c} not found in plans; skipping.")
            continue
        configuration_manager = plans_manager.get_configuration(c)
        preprocessor = configuration_manager.preprocessor_class(verbose=verbose)
        preprocessor.run(dataset_id, c, plans_identifier, num_processes=n)

    # copy gt segmentations for later evaluation (ref :134-142)
    gt_folder = os.path.join(paths.nnUNet_preprocessed(), dataset_name, "gt_segmentations")
    os.makedirs(gt_folder, exist_ok=True)
    dataset_json = load_json(os.path.join(paths.nnUNet_raw(), dataset_name, "dataset.json"))
    dataset = get_filenames_of_train_images_and_targets(
        os.path.join(paths.nnUNet_raw(), dataset_name), dataset_json
    )
    for k in dataset:
        dst = os.path.join(gt_folder, k + dataset_json["file_ending"])
        src = dataset[k]["label"]
        if not os.path.isfile(dst) or os.path.getmtime(src) > os.path.getmtime(dst):
            shutil.copy(src, dst)


def preprocess(dataset_ids: List[int], plans_identifier: str = "nnUNetPlans",
               configurations=("2d", "3d_fullres", "3d_lowres"),
               num_processes=(8, 4, 8), verbose: bool = False):
    for d in dataset_ids:
        preprocess_dataset(d, plans_identifier, configurations, num_processes, verbose)
