"""Dataset/result folder resolution via environment variables.

Keeps the reference's env-var contract (ref: dinounet/paths.py:21-23):
``nnUNet_raw``, ``nnUNet_preprocessed``, ``nnUNet_results``.
"""

import os


def _get(name: str):
    return os.environ.get(name)


def nnUNet_raw() -> str:
    p = _get("nnUNet_raw")
    if p is None:
        raise RuntimeError(
            "nnUNet_raw is not defined. Set the nnUNet_raw environment variable to the "
            "folder containing your raw Dataset%03d_* folders."
        )
    return p


def nnUNet_preprocessed() -> str:
    p = _get("nnUNet_preprocessed")
    if p is None:
        raise RuntimeError("nnUNet_preprocessed environment variable is not set.")
    return p


def nnUNet_results() -> str:
    p = _get("nnUNet_results")
    if p is None:
        raise RuntimeError("nnUNet_results environment variable is not set.")
    return p
