"""Shared test fixtures: synthetic nnU-Net-format datasets."""

import os

import numpy as np
from PIL import Image

from dinounet_tpu.imageio.nifti import write_nifti
from dinounet_tpu.utilities.json_export import save_json


def make_png_dataset(root: str, dataset_name: str = "Dataset501_Toy2d", n_cases: int = 6,
                     size=(72, 64), n_classes: int = 3, seed: int = 0) -> str:
    """2-D PNG dataset (one channel), the DinoUNet main-path format.

    Height >= width: with force_target_shape the reference planner derives the
    transpose from argmax over the 2-element in-plane spacing vector
    (ref default_experiment_planner.py:290-299), so width > height would rotate
    the transpose and garble the forced patch size. We replicate the reference
    behavior exactly, quirk included, and test the intended H >= W case.
    """
    rng = np.random.default_rng(seed)
    folder = os.path.join(root, dataset_name)
    os.makedirs(os.path.join(folder, "imagesTr"), exist_ok=True)
    os.makedirs(os.path.join(folder, "labelsTr"), exist_ok=True)
    for i in range(n_cases):
        img = (rng.uniform(0, 255, size)).astype(np.uint8)
        seg = np.zeros(size, np.uint8)
        # blobs per class
        for c in range(1, n_classes):
            cx, cy = rng.integers(8, size[0] - 8), rng.integers(8, size[1] - 8)
            yy, xx = np.mgrid[: size[0], : size[1]]
            seg[(yy - cx) ** 2 + (xx - cy) ** 2 < rng.integers(16, 64)] = c
        Image.fromarray(img).save(os.path.join(folder, "imagesTr", f"case_{i:03d}_0000.png"))
        Image.fromarray(seg).save(os.path.join(folder, "labelsTr", f"case_{i:03d}.png"))
    save_json(
        {
            "channel_names": {"0": "rescale_to_0_1"},
            "labels": {"background": 0, **{f"class{c}": c for c in range(1, n_classes)}},
            "numTraining": n_cases,
            "file_ending": ".png",
            "overwrite_image_reader_writer": "NaturalImage2DIO",
        },
        os.path.join(folder, "dataset.json"),
    )
    return folder


def make_nifti_dataset(root: str, dataset_name: str = "Dataset502_Toy3d", n_cases: int = 4,
                       size=(12, 24, 28), spacing=(2.5, 1.0, 1.0), n_classes: int = 2,
                       seed: int = 0) -> str:
    """3-D nii.gz dataset (one channel, anisotropic spacing)."""
    rng = np.random.default_rng(seed)
    folder = os.path.join(root, dataset_name)
    os.makedirs(os.path.join(folder, "imagesTr"), exist_ok=True)
    os.makedirs(os.path.join(folder, "labelsTr"), exist_ok=True)
    spacing_xyz = [spacing[2], spacing[1], spacing[0]]
    for i in range(n_cases):
        img = rng.normal(100, 30, size).astype(np.float32)
        seg = np.zeros(size, np.uint8)
        z0, y0, x0 = [s // 2 for s in size]
        seg[z0 - 2 : z0 + 2, y0 - 5 : y0 + 5, x0 - 5 : x0 + 5] = 1
        img[seg == 1] += 60
        write_nifti(os.path.join(folder, "imagesTr", f"vol_{i:03d}_0000.nii.gz"), img, spacing_xyz)
        write_nifti(os.path.join(folder, "labelsTr", f"vol_{i:03d}.nii.gz"), seg, spacing_xyz)
    save_json(
        {
            "channel_names": {"0": "CT"},
            "labels": {"background": 0, "organ": 1},
            "numTraining": n_cases,
            "file_ending": ".nii.gz",
        },
        os.path.join(folder, "dataset.json"),
    )
    return folder
