"""Small shared helpers: cross-validation splits, dataset-name resolution,
results-folder naming. ref: dinounet/utilities/{crossval_split.py,
dataset_name_id_conversion.py,file_path_utilities.py}.
"""

import os
from typing import List, Union

import numpy as np


def generate_crossval_split(train_identifiers: List[str], seed: int = 12345,
                            n_splits: int = 5) -> List[dict]:
    """Deterministic KFold splits (shuffled with `seed`), like sklearn.KFold.

    ref: dinounet/utilities/crossval_split.py:7 (sklearn KFold, shuffle=True, seed 12345).
    """
    from sklearn.model_selection import KFold

    splits = []
    kfold = KFold(n_splits=n_splits, shuffle=True, random_state=seed)
    ids = np.array(train_identifiers)
    for train_idx, test_idx in kfold.split(ids):
        splits.append({
            "train": [str(i) for i in ids[train_idx]],
            "val": [str(i) for i in ids[test_idx]],
        })
    return splits


def maybe_convert_to_dataset_name(dataset_name_or_id: Union[int, str]) -> str:
    """Resolve an integer id (or 'DatasetXXX_name') to the dataset folder name.

    ref: dinounet/utilities/dataset_name_id_conversion.py:21-79.
    """
    if isinstance(dataset_name_or_id, str) and dataset_name_or_id.startswith("Dataset"):
        return dataset_name_or_id
    try:
        dataset_id = int(dataset_name_or_id)
    except ValueError:
        raise ValueError(
            f"dataset_name_or_id must be an int or a 'DatasetXXX_name' string, got {dataset_name_or_id}"
        )
    from dinounet_tpu import paths

    candidates = []
    for base_fn in (paths.nnUNet_raw, paths.nnUNet_preprocessed, paths.nnUNet_results):
        try:
            base = base_fn()
        except RuntimeError:
            continue
        if os.path.isdir(base):
            candidates += [
                d for d in os.listdir(base)
                if d.startswith(f"Dataset{dataset_id:03d}_") and os.path.isdir(os.path.join(base, d))
            ]
    candidates = sorted(set(candidates))
    if len(candidates) == 0:
        raise RuntimeError(
            f"Could not find a dataset with id {dataset_id} in nnUNet_raw/preprocessed/results"
        )
    if len(set(candidates)) > 1:
        raise RuntimeError(f"Multiple datasets with id {dataset_id}: {candidates}")
    return candidates[0]


def convert_identifier_to_trained_model_output_folder(
    dataset_name: str, trainer_name: str, plans_identifier: str, configuration: str
) -> str:
    """results/<dataset>/<Trainer>__<plans>__<config> (ref: file_path_utilities.py:19)."""
    from dinounet_tpu import paths

    return os.path.join(
        paths.nnUNet_results(),
        dataset_name,
        f"{trainer_name}__{plans_identifier}__{configuration}",
    )


def get_allowed_n_proc_DA() -> int:
    """Number of data-augmentation workers (env-overridable).

    ref: dinounet/utilities/default_n_proc_DA.py:5.
    """
    if "nnUNet_n_proc_DA" in os.environ:
        return int(os.environ["nnUNet_n_proc_DA"])
    return min(12, os.cpu_count() or 8)


def convert_trainer_plans_config_to_identifier(trainer_name: str,
                                               plans_identifier: str,
                                               configuration: str) -> str:
    """ref: utilities/file_path_utilities.py:11."""
    return f"{trainer_name}__{plans_identifier}__{configuration}"


def convert_identifier_to_trainer_plans_config(identifier: str):
    """ref: utilities/file_path_utilities.py:15."""
    return os.path.basename(identifier).split("__")


def get_output_folder(dataset_name_or_id, trainer_name: str = "nnUNetTrainer",
                      plans_identifier: str = "nnUNetPlans",
                      configuration: str = "3d_fullres",
                      fold=None) -> str:
    """results/<dataset>/<Trainer>__<plans>__<config>[/fold_N]
    (ref: utilities/file_path_utilities.py:19-31)."""
    out = convert_identifier_to_trained_model_output_folder(
        maybe_convert_to_dataset_name(dataset_name_or_id), trainer_name,
        plans_identifier, configuration)
    if fold is not None:
        out = os.path.join(out, f"fold_{fold}")
    return out


def folds_tuple_to_string(folds) -> str:
    """ref: utilities/file_path_utilities.py:82."""
    return "_".join(str(f) for f in folds)


def folds_string_to_tuple(folds_string: str):
    """ref: utilities/file_path_utilities.py:89."""
    return tuple(f if f == "all" else int(f) for f in folds_string.split("_"))
