"""Global configuration knobs.

Mirrors the reference's global configuration surface
(ref: dinounet/configuration.py:5-10) while adding TPU-specific switches.
"""

import os

# Number of host-side worker processes/threads for preprocessing & friends.
default_num_processes = int(os.environ.get("nnUNet_def_n_proc", 8))

# Above this spacing-anisotropy ratio the resampling switches to the
# separate-z path (per-slice 2D resampling + independent z interpolation).
ANISO_THRESHOLD = 3

# Which MSDeformAttn implementation to use: "pallas" (TPU kernel) or "jax"
# (pure-JAX gather fallback; also the numerical reference for tests).
MSDA_IMPL = os.environ.get("DINOUNET_TPU_MSDA_IMPL", "auto")


def use_pallas_msda() -> bool:
    """Pallas MSDA on TPU backends, pure-JAX gather elsewhere (CPU tests)."""
    if MSDA_IMPL == "pallas":
        return True
    if MSDA_IMPL == "jax":
        return False
    import jax

    return jax.default_backend() not in ("cpu",)
