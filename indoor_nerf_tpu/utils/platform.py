"""Host-platform selection for scripts and experiments.

The axon site hook (reached via the ambient ``PYTHONPATH``) registers the
TPU backend at interpreter startup and overrides a ``JAX_PLATFORMS`` set
in the environment — forcing CPU requires ``jax.config.update`` AFTER
``import jax`` (tests/conftest.py applies the same rule for the test
mesh). Scripts call :func:`apply_platform_env` before their first JAX
computation so ``INDOOR_NERF_PLATFORM=cpu python scripts/...`` runs on
the host CPU even when the TPU backend is present (or wedged — backend
init on a wedged axon tunnel HANGS, it does not error).
"""

from __future__ import annotations

import os

ENV_VAR = "INDOOR_NERF_PLATFORM"


def apply_platform_env(var: str = ENV_VAR) -> str | None:
    """If ``$INDOOR_NERF_PLATFORM`` is set, pin JAX to that platform.

    Returns the applied platform name, or None when the variable is
    unset (ambient backend selection stands).
    """
    value = os.environ.get(var)
    if value:
        import jax

        jax.config.update("jax_platforms", value)
    return value or None
