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
    maybe_init_distributed()


def maybe_init_distributed() -> None:
    """Multi-host: initialize the JAX distributed runtime when the standard
    env (PRIME_RL_COORDINATOR + PRIME_RL_NUM_PROCESSES + PRIME_RL_PROCESS_ID,
    or a TPU pod environment detected by jax itself) asks for it. On a pod
    slice this makes ``jax.devices()`` span all hosts, so the same mesh code
    scales from 1 chip to a slice unchanged (SURVEY.md §7 stage 6)."""
    import jax

    coord = os.environ.get("PRIME_RL_COORDINATOR")
    if not coord:
        return
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["PRIME_RL_NUM_PROCESSES"]),
        process_id=int(os.environ["PRIME_RL_PROCESS_ID"]),
    )
