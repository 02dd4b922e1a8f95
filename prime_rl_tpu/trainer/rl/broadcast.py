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


class MultiBroadcast:
    def __init__(self, sinks: list):
        self.sinks = sinks

    def publish(self, params: Params, version: int) -> None:
        for s in self.sinks:
            s.publish(params, version)
