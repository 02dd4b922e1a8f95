"""Weight-broadcast sinks: how a new policy reaches the sampler pool.

TPU-native collapse of the reference's 2.5k-LoC NCCL/NIXL broadcast stack
(reference: trainer/rl/broadcast/*, SURVEY.md §2.4):

- ``FilesystemBroadcast``: HF snapshot per step + STABLE marker; the
  orchestrator's watcher pauses/updates/resumes remote engines
  (reference: broadcast/filesystem.py).
- ``ColocatedBroadcast``: learner and sampler share one process/mesh — the
  update is a device-to-device cast of the live param pytree into the
  engine between steps (pause → swap → resume). Zero copies leave the
  chip; this replaces the reference's NCCL layerwise streaming.
"""

from __future__ import annotations

from typing import Protocol

from prime_rl_tpu.models.base import Params


class WeightBroadcastSink(Protocol):
    def publish(self, params: Params, version: int) -> None: ...


class FilesystemBroadcast:
    def __init__(self, weight_mgr):
        self.weight_mgr = weight_mgr

    def publish(self, params: Params, version: int) -> None:
        self.weight_mgr.save(params, version)


class ColocatedBroadcast:
    """Swap the live engine's params in place; version-atomic via pause.

    Preserves the reference ordering (watcher.py:119-135): the orchestrator
    sees the bumped version over /liveness BEFORE requests sampled under it
    complete, matching the pre-apply publish semantics.
    """

    def __init__(self, engine):
        self.engine = engine

    def publish(self, params: Params, version: int) -> None:
        self.engine.pause()
        try:
            self.engine.update_params(params, version=version)
        finally:
            self.engine.resume()


def _cast_floats(params: Params, dtype: str | None) -> Params:
    """Cast float leaves on device before the host get (the reference
    quantizes-in-transfer the same way: broadcast/nccl.py:34-68)."""
    if dtype is None:
        return params
    import jax
    import jax.numpy as jnp

    target = jnp.dtype(dtype)
    return jax.tree.map(
        lambda x: x.astype(target) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def _to_wire(params: Params, transfer_dtype: str | None) -> dict:
    """Flatten + move to host in the wire format. ``transfer_dtype``
    'float8_e4m3' quantizes every >=2-D float tensor on DEVICE with a
    per-tensor absmax scale (1 byte/param on the wire — half of bf16; the
    reference's fp8 quantize-in-transfer, broadcast/nccl.py:34-68); the
    scale rides a tiny ``path!scale`` companion entry. Norms/scalars stay
    in their native dtype. Other values are a plain device-side cast."""
    import jax
    import jax.numpy as jnp

    from prime_rl_tpu.transport.weights import SCALE_SUFFIX, flatten_params

    if transfer_dtype != "float8_e4m3":
        return jax.device_get(flatten_params(_cast_floats(params, transfer_dtype)))
    named = flatten_params(params)
    out = {}
    for p, a in named.items():
        if jnp.issubdtype(a.dtype, jnp.floating) and a.ndim >= 2:
            scale = jnp.maximum(jnp.max(jnp.abs(a.astype(jnp.float32))), 1e-12) / 448.0
            out[p] = (a.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
            out[p + SCALE_SUFFIX] = scale.reshape(1).astype(jnp.float32)
        else:
            out[p] = a
    return jax.device_get(out)


class ShmBroadcast:
    """Same-host disaggregated weight plane: the sampler runs in its OWN
    process (own chips/devices) and receives per-step weights through a
    double-buffered shared-memory arena — one device→host get, one host-RAM
    copy, zero disk (reference: broadcast/nccl.py:197-267; SURVEY.md §2.6).
    """

    def __init__(self, output_dir: str, transfer_dtype: str | None = "bfloat16"):
        from prime_rl_tpu.transport.weights import resolve_plane_id, shm_name_for

        self._name = shm_name_for(resolve_plane_id(output_dir))
        self._writer = None
        self._dtype = transfer_dtype

    def publish(self, params: Params, version: int) -> None:
        from prime_rl_tpu.transport.weights import ShmWeightWriter, WeightLayout

        named = _to_wire(params, self._dtype)
        if self._writer is None:
            self._writer = ShmWeightWriter(self._name, WeightLayout.from_params(named))
        self._writer.publish(named, version)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class ZmqStreamBroadcast:
    """Cross-host weight plane: layerwise tensor streaming over ZMQ/DCN
    (reference: broadcast/nccl.py layerwise streaming; NIXL RDMA analogue)."""

    def __init__(self, pub_port: int, rep_port: int, host: str = "*",
                 transfer_dtype: str | None = "bfloat16"):
        from prime_rl_tpu.transport.weights import ZmqStreamWriter

        self._writer = ZmqStreamWriter(pub_port, rep_port, host)
        self._dtype = transfer_dtype

    def publish(self, params: Params, version: int) -> None:
        self._writer.publish(_to_wire(params, self._dtype), version)

    def close(self) -> None:
        self._writer.close()


class DcnPullBroadcast:
    """On-fabric disaggregated weight plane: the learner queues each step's
    DEVICE arrays on a ``jax.experimental.transfer`` server and samplers pull
    them one-sided over DCN/ICI straight into their own device memory — no
    host staging, no disk (the reference's NIXL RDMA reads, broadcast/nixl/
    + worker/nixl.py, re-expressed on the TPU-native transfer runtime).
    Requires a PJRT runtime with transfer support (multi-host TPU pods);
    config-gated, never auto-selected."""

    def __init__(self, output_dir: str, transfer_dtype: str | None = "bfloat16",
                 num_pullers: int = 1):
        from prime_rl_tpu.transport.weights import DcnPullWriter

        self._writer = DcnPullWriter(output_dir, num_pullers=num_pullers)
        self._dtype = transfer_dtype

    def publish(self, params: Params, version: int) -> None:
        import jax
        import jax.numpy as jnp

        from prime_rl_tpu.transport.weights import SCALE_SUFFIX, flatten_params

        # quantize-in-transfer stays ON DEVICE — the wire is the fabric
        if self._dtype == "float8_e4m3":
            named = flatten_params(params)
            out = {}
            for p, a in named.items():
                if jnp.issubdtype(a.dtype, jnp.floating) and a.ndim >= 2:
                    scale = jnp.maximum(
                        jnp.max(jnp.abs(a.astype(jnp.float32))), 1e-12) / 448.0
                    out[p] = (a.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
                    out[p + SCALE_SUFFIX] = scale.reshape(1).astype(jnp.float32)
                else:
                    out[p] = a
            named = out
        else:
            named = flatten_params(_cast_floats(params, self._dtype))
        self._writer.publish({p: jnp.asarray(a) for p, a in named.items()}, version)

    def close(self) -> None:
        self._writer.close()


class MultiBroadcast:
    def __init__(self, sinks: list):
        self.sinks = sinks

    def publish(self, params: Params, version: int) -> None:
        for s in self.sinks:
            s.publish(params, version)


def make_broadcast(config, weight_mgr, output_dir: str):
    """Build the configured sink (trainer entrypoint path; the colocated
    entrypoint overrides with ColocatedBroadcast directly)."""
    if config.type == "device":
        if config.mode == "shm":
            return ShmBroadcast(output_dir, config.transfer_dtype)
        if config.mode == "zmq_stream":
            return ZmqStreamBroadcast(config.pub_port, config.rep_port,
                                      transfer_dtype=config.transfer_dtype)
        if config.mode == "dcn_pull":
            return DcnPullBroadcast(output_dir, config.transfer_dtype,
                                    num_pullers=config.num_pullers)
        raise ValueError(
            f"broadcast mode {config.mode!r} needs the colocated entrypoint"
            if config.mode == "colocated"
            else f"unknown device broadcast mode {config.mode!r}"
        )
    return FilesystemBroadcast(weight_mgr)
