"""Training launch helpers.

Capability parity with ref: dinounet/run/run_training.py:31-277 and
run/load_pretrained_weights.py:6-64. The reference's multi-GPU path spawns one
process per GPU and initializes NCCL (ref :104-138,169-194); here a single
process drives all local devices through GSPMD (the trainer shards its batch
over a jax.sharding.Mesh), so `num_gpus` only sanity-checks the device count.
"""

import os
from typing import Optional, Union

import jax
import numpy as np

from dinounet_tpu import paths
from dinounet_tpu.utilities import registry
from dinounet_tpu.utilities.json_export import load_json
from dinounet_tpu.utilities.misc import maybe_convert_to_dataset_name

# make sure all built-in trainers are registered
import dinounet_tpu.training.trainer  # noqa: F401
import dinounet_tpu.training.trainer_variants  # noqa: F401
import dinounet_tpu.training.dinounet_trainer  # noqa: F401


def get_trainer_from_args(dataset_name_or_id: Union[int, str], configuration: str,
                          fold: int, trainer_name: str = "nnUNetTrainer",
                          plans_identifier: str = "nnUNetPlans",
                          use_compressed: bool = False, device=None):
    """ref run_training.py:31-70 (registry lookup replaces the module walk)."""
    trainer_class = registry.trainers.get(trainer_name)
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    preprocessed = os.path.join(paths.nnUNet_preprocessed(), dataset_name)
    plans = load_json(os.path.join(preprocessed, plans_identifier + ".json"))
    dataset_json = load_json(os.path.join(preprocessed, "dataset.json"))
    return trainer_class(
        plans=plans, configuration=configuration, fold=fold,
        dataset_json=dataset_json, unpack_dataset=not use_compressed, device=device,
    )


def maybe_load_checkpoint(trainer, continue_training: bool,
                          validation_only: bool) -> None:
    """Resume from final -> latest -> best (ref run_training.py:73-101)."""
    if continue_training and validation_only:
        raise RuntimeError("Cannot both continue a training AND only run validation")
    expected = None
    if continue_training:
        for name in ("checkpoint_final.pth", "checkpoint_latest.pth", "checkpoint_best.pth"):
            cand = os.path.join(trainer.output_folder, name)
            if os.path.exists(cand):
                expected = cand
                break
        if expected is None:
            print("WARNING: Cannot continue training because there is no checkpoint. "
                  "Starting a new training...")
    elif validation_only:
        expected = os.path.join(trainer.output_folder, "checkpoint_final.pth")
        if not os.path.exists(expected):
            raise RuntimeError(
                "Cannot run validation because the training is not finished yet!"
            )
    if expected is not None:
        trainer.load_checkpoint(expected)


def load_pretrained_weights(trainer, pretrained_weights_file: str, verbose: bool = False):
    """Shape-checked transfer of all weights except seg heads
    (ref run/load_pretrained_weights.py:6-64)."""
    from dinounet_tpu.training.checkpointing import load_checkpoint

    ckpt = load_checkpoint(pretrained_weights_file)
    source = ckpt["network_weights"]["params"]

    def transfer(dst, src, path=()):
        if isinstance(dst, dict):
            return {
                k: transfer(v, src.get(k), path + (k,)) if isinstance(src, dict) else v
                for k, v in dst.items()
            }
        if src is None:
            return dst
        if any("seg" in p for p in path):
            return dst  # never transfer segmentation heads
        if tuple(np.shape(src)) == tuple(np.shape(dst)):
            if verbose:
                print(f"transferred {'/'.join(path)}")
            return np.asarray(src, dtype=dst.dtype) if hasattr(dst, "dtype") else src
        return dst

    params = transfer(trainer.variables["params"], source)
    trainer.variables = dict(trainer.variables)
    trainer.variables["params"] = params


def run_training(dataset_name_or_id: Union[str, int], configuration: str,
                 fold: Union[int, str], trainer_class_name: str = "nnUNetTrainer",
                 plans_identifier: str = "nnUNetPlans",
                 pretrained_weights: Optional[str] = None, num_gpus: int = 1,
                 use_compressed_data: bool = False,
                 export_validation_probabilities: bool = False,
                 continue_training: bool = False, only_run_validation: bool = False,
                 disable_checkpointing: bool = False, val_with_best: bool = False,
                 device=None):
    """ref run_training.py:141-215 (single process; GSPMD over local devices)."""
    if fold != "all":
        fold = int(fold)

    trainer = get_trainer_from_args(
        dataset_name_or_id, configuration, fold, trainer_class_name,
        plans_identifier, use_compressed_data, device,
    )
    if disable_checkpointing:
        trainer.save_checkpoint = lambda *a, **k: None

    if not only_run_validation:
        maybe_load_checkpoint(trainer, continue_training, only_run_validation)
        if pretrained_weights is not None:
            if not trainer.was_initialized:
                trainer.initialize()
            load_pretrained_weights(trainer, pretrained_weights, verbose=True)
        trainer.run_training()
    else:
        if not trainer.was_initialized:
            trainer.initialize()
        maybe_load_checkpoint(trainer, continue_training, only_run_validation)

    if val_with_best:
        trainer.load_checkpoint(os.path.join(trainer.output_folder, "checkpoint_best.pth"))
    trainer.perform_actual_validation(export_validation_probabilities)
    return trainer


def run_training_entry():
    """Training CLI (ref run/run_training.py:218-277, nnUNetv2_train).

    --num_gpus is accepted for reference-CLI compatibility: parallelism comes
    from the devices JAX sees (a Mesh over them), not process spawning.
    """
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("dataset_name_or_id", type=str)
    parser.add_argument("configuration", type=str)
    parser.add_argument("fold", type=str, help="0..4 or 'all'")
    parser.add_argument("-tr", type=str, default="nnUNetTrainer")
    parser.add_argument("-p", type=str, default="nnUNetPlans")
    parser.add_argument("-pretrained_weights", type=str, default=None)
    parser.add_argument("-num_gpus", type=int, default=1,
                        help="compat flag; the device mesh is auto-detected")
    parser.add_argument("--use_compressed", action="store_true")
    parser.add_argument("--npz", action="store_true",
                        help="export softmax probabilities of the validation set")
    parser.add_argument("--c", action="store_true", help="continue training")
    parser.add_argument("--val", action="store_true", help="only run validation")
    parser.add_argument("--val_best", action="store_true",
                        help="validate with checkpoint_best")
    parser.add_argument("--disable_checkpointing", action="store_true")
    parser.add_argument("-device", type=str, default=None)
    args = parser.parse_args()

    run_training(
        args.dataset_name_or_id, args.configuration, args.fold,
        trainer_class_name=args.tr, plans_identifier=args.p,
        pretrained_weights=args.pretrained_weights, num_gpus=args.num_gpus,
        use_compressed_data=args.use_compressed,
        export_validation_probabilities=args.npz, continue_training=args.c,
        only_run_validation=args.val, disable_checkpointing=args.disable_checkpointing,
        val_with_best=args.val_best, device=args.device,
    )


if __name__ == "__main__":
    run_training_entry()
