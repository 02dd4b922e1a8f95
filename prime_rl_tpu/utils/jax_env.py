"""JAX platform/runtime bootstrap for entrypoints.

The TPU image registers the ``axon`` platform plugin in a way that wins over
the ``JAX_PLATFORMS`` environment variable. Entrypoints call
``configure_jax()`` first so explicit user env (e.g. ``JAX_PLATFORMS=cpu``
for the virtual-device test mesh) takes effect before any backend
initializes.
"""

from __future__ import annotations

import os


def configure_jax() -> None:
    import jax

    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        try:
            jax.config.update("jax_platforms", plats)
        except RuntimeError:
            pass  # backend already initialized; env decided the platform
