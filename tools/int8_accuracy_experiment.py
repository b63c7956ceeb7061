"""Offline accuracy bound for the int8 serving mode (VERDICT r2 item 9).

`DINOUNET_TPU_VIT_INT8=1` (w8a8 dynamic quant of the frozen backbone's
linears) shipped in round 2 with throughput numbers but no accuracy
evidence. No published weights are reachable here, so this bounds the mode
offline on the two proxies available:

  A. converted-random weights: per-layer weight-quantization error over
     every backbone linear, plus end-to-end fp-vs-int8 logit error and
     argmax agreement on synthetic tiles (dinounet_b, the headline model);
  B. (--trained <workdir>) a trained-synthetic checkpoint from
     tools/learnability_run.py: sliding-window validation Dice with int8
     off vs on — an end-to-end Dice-delta bound on a real trained network.

Prints one JSON line with all measured bounds.

Usage:
    python tools/int8_accuracy_experiment.py            # part A
    python tools/int8_accuracy_experiment.py --trained <learnability_workdir>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _quant_error_per_layer(params) -> dict:
    """Per-output-channel symmetric int8 weight quantization error for every
    2-D kernel in the backbone param tree: rel-L2 per layer (worst / median)."""
    import jax

    errs = {}

    def visit(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if names and names[-1] == "kernel" and leaf.ndim == 2:
            w = np.asarray(leaf, np.float32)
            scale = np.abs(w).max(axis=0, keepdims=True) / 127.0
            scale = np.where(scale == 0, 1.0, scale)
            q = np.clip(np.round(w / scale), -127, 127) * scale
            rel = float(np.linalg.norm(q - w) / max(np.linalg.norm(w), 1e-9))
            errs["/".join(names[:-1])] = rel
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return errs


def part_a():
    import jax
    import jax.numpy as jnp

    from dinounet_tpu.models.dinounet import (
        DINOV3_INTERACTION_INDEXES,
        DINOV3_MODEL_NAMES,
        DinoUNet,
        DinoUNetConfig,
    )
    from dinounet_tpu.models.vit import VIT_CONFIGS

    cfg = DinoUNetConfig(
        vit=VIT_CONFIGS[DINOV3_MODEL_NAMES["dinounet_b"]],
        interaction_indexes=DINOV3_INTERACTION_INDEXES["dinounet_b"],
        num_classes=3,
    )
    model = DinoUNet(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.0, 1.0, (2, 512, 512, 1)), jnp.bfloat16)
    log("initializing dinounet_b (random weights) ...")
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)

    # the int8 mode quantizes the frozen ViT's linears, which live under
    # the "backbone" key of the param tree
    layer_errs = _quant_error_per_layer(
        variables["params"].get("backbone", variables["params"]))

    def run(int8: bool):
        os.environ["DINOUNET_TPU_VIT_INT8"] = "1" if int8 else "0"
        out = jax.jit(lambda v, a: model.apply(v, a, train=False))(
            variables, x)
        if isinstance(out, (list, tuple)):
            out = out[0]
        return np.asarray(out, np.float32)

    log("fp forward ...")
    ref = run(False)
    log("int8 forward ...")
    q = run(True)
    os.environ["DINOUNET_TPU_VIT_INT8"] = "0"

    rel = float(np.linalg.norm(q - ref) / max(np.linalg.norm(ref), 1e-9))
    mae = float(np.abs(q - ref).mean())
    agree = float((q.argmax(1) == ref.argmax(1)).mean())
    errs = sorted(layer_errs.values())
    return {
        "logit_rel_l2": rel,
        "logit_mae": mae,
        "argmax_agreement": agree,
        "weight_quant_rel_l2_median": errs[len(errs) // 2] if errs else None,
        "weight_quant_rel_l2_worst": errs[-1] if errs else None,
        "n_quantized_layers": len(errs),
    }


def part_b(workdir: str):
    """Re-run sliding-window validation of a trained learnability checkpoint
    with int8 off vs on; returns both foreground Dice values."""
    os.environ["nnUNet_raw"] = os.path.join(workdir, "raw")
    os.environ["nnUNet_preprocessed"] = os.path.join(workdir, "preprocessed")
    os.environ["nnUNet_results"] = os.path.join(workdir, "results")

    import glob

    folds = glob.glob(os.path.join(
        os.environ["nnUNet_results"], "*", "*", "fold_*"))
    if not folds:
        raise SystemExit(f"no trained fold under {workdir}/results")
    fold_dir = sorted(folds)[0]
    result_folder = os.path.dirname(fold_dir)
    log(f"re-validating {fold_dir}")

    from dinounet_tpu.api import evaluate

    # result folder name encodes Trainer__Plans__configuration
    trainer_name, plans_id, config = os.path.basename(result_folder).split("__")
    fold = int(os.path.basename(fold_dir).split("_")[1])

    def run(int8: bool):
        os.environ["DINOUNET_TPU_VIT_INT8"] = "1" if int8 else "0"
        from dinounet_tpu.run import run_training

        # validation-only restore: initialize + load the final checkpoint +
        # sliding-window validation (the same path as `--val` on the CLI)
        run_training(606, config, fold, trainer_class_name=trainer_name,
                     plans_identifier=plans_id, only_run_validation=True)
        # evaluate expects the FOLD dir (pred = <result_folder>/validation,
        # ref api.py:634-636)
        res = evaluate(606, fold_dir)
        return (res.get("foreground_mean") or {}).get("Dice")

    dice_fp = run(False)
    dice_int8 = run(True)
    os.environ["DINOUNET_TPU_VIT_INT8"] = "0"
    return {"val_fg_dice_fp": dice_fp, "val_fg_dice_int8": dice_int8,
            "dice_delta": (None if None in (dice_fp, dice_int8)
                           else dice_int8 - dice_fp)}


def main():
    out = {"metric": "int8_accuracy_bounds"}
    if "--trained" in sys.argv:
        wd = sys.argv[sys.argv.index("--trained") + 1]
        out.update(part_b(wd))
    else:
        out.update(part_a())
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
