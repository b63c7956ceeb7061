"""End-to-end learnability check on the real TPU (BASELINE.md's closing loop).

Generates a synthetic 2-D dataset with intensity-correlated disk targets
(the Dataset606 pattern from round 1), then drives the full
`dinounet_training.py` flow — plan_and_preprocess(force_target_shape=[512,512])
→ training(lr 1e-3, N epochs) → evaluate — for dinounet_s with a random-init
frozen backbone. Foreground Dice > 0.95 certifies training correctness of the
whole stack (Pallas MSDA fwd+bwd through the premapped layouts, on-device
augmentation, DC+CE, sliding-window validation + export).

Usage: python tools/learnability_run.py [epochs] [workdir]
Prints one JSON line with the final foreground Dice.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np


def make_dataset(root: str, n_cases: int = 10, size: int = 512,
                 dataset_name: str = "Dataset606_Learn") -> None:
    """Intensity-correlated disks: class-k pixels are brighter by 0.3*k, so
    the task is learnable from intensity alone."""
    from PIL import Image

    from dinounet_tpu.utilities.json_export import save_json

    rng = np.random.default_rng(0)
    folder = os.path.join(root, dataset_name)
    os.makedirs(os.path.join(folder, "imagesTr"), exist_ok=True)
    os.makedirs(os.path.join(folder, "labelsTr"), exist_ok=True)
    for i in range(n_cases):
        img = rng.normal(90.0, 25.0, (size, size))
        seg = np.zeros((size, size), np.uint8)
        for c in (1, 2):
            for _ in range(3):
                cy, cx = rng.integers(40, size - 40, 2)
                r = rng.integers(20, 60)
                yy, xx = np.ogrid[:size, :size]
                disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
                seg[disk] = c
                img[disk] += 45.0 * c
        img = np.clip(img, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(folder, "imagesTr", f"case_{i:03d}_0000.png"))
        Image.fromarray(seg).save(
            os.path.join(folder, "labelsTr", f"case_{i:03d}.png"))
    save_json(
        {
            "channel_names": {"0": "rescale_to_0_1"},
            "labels": {"background": 0, "disk1": 1, "disk2": 2},
            "numTraining": n_cases,
            "file_ending": ".png",
            "overwrite_image_reader_writer": "NaturalImage2DIO",
        },
        os.path.join(folder, "dataset.json"),
    )


def main(epochs: int = 10, workdir: str = None):
    workdir = workdir or tempfile.mkdtemp(prefix="dinounet_learn_")
    for sub in ("raw", "preprocessed", "results"):
        os.makedirs(os.path.join(workdir, sub), exist_ok=True)
    os.environ["nnUNet_raw"] = os.path.join(workdir, "raw")
    os.environ["nnUNet_preprocessed"] = os.path.join(workdir, "preprocessed")
    os.environ["nnUNet_results"] = os.path.join(workdir, "results")

    make_dataset(os.environ["nnUNet_raw"])
    print(f"dataset ready under {workdir}", file=sys.stderr, flush=True)

    import dinounet_training

    _folder, _log, results = dinounet_training.main_dinov3(
        model_name="dinounet_s", dataset_id=606, num_epochs=epochs)
    fg = None
    if isinstance(results, dict):
        fg = (results.get("foreground_mean") or {}).get("Dice")
    print(json.dumps({
        "metric": "learnability_fg_dice", "value": fg,
        "epochs": epochs, "workdir": workdir}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10,
         sys.argv[2] if len(sys.argv) > 2 else None)
