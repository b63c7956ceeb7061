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

def use_pallas_msda() -> bool:
    """Pallas MSDA on TPU backends, pure-JAX gather elsewhere (CPU tests).

    Controlled by env DINOUNET_TPU_MSDA_IMPL in {"auto", "pallas", "jax"}.
    """
    impl = os.environ.get("DINOUNET_TPU_MSDA_IMPL", "auto")
    if impl == "pallas":
        return True
    if impl == "jax":
        return False
    import jax

    return jax.default_backend() not in ("cpu",)
