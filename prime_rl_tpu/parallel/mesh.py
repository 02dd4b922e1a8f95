"""Device mesh construction and named-axis conventions.

The TPU-native replacement for the reference's torch DeviceMesh builder
(reference: trainer/parallel_dims.py:36-343). One logical mesh with axes

    (replica, fsdp, expert, context, tensor)

covers the reference's pp×dp_replicate×dp_shard×cp (+EP borrowing) layout:

- batch is sharded over ``replica × fsdp`` jointly (HSDP: replica is the
  outer replication dim, fsdp the param-sharding dim),
- params/optimizer state are sharded over ``fsdp`` (ZeRO-3 analogue) and
  ``tensor`` (TP),
- sequence over ``context`` (CP), experts over ``expert`` (EP).

XLA/GSPMD inserts the collectives; EP/CP hot paths use shard_map explicitly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prime_rl_tpu.configs.shared import MeshConfig

AXIS_NAMES = ("replica", "fsdp", "expert", "context", "tensor")
DATA_AXES = ("replica", "fsdp")  # batch dim sharded over both


@dataclass(frozen=True)
class MeshInfo:
    mesh: Mesh
    sizes: dict[str, int]

    @property
    def dp_size(self) -> int:
        return self.sizes["replica"] * self.sizes["fsdp"]

    @property
    def cp_size(self) -> int:
        return self.sizes["context"]

    @property
    def tp_size(self) -> int:
        return self.sizes["tensor"]

    @property
    def ep_size(self) -> int:
        return self.sizes["expert"]

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    def data_sharding(self) -> NamedSharding:
        """[B, L, ...] batch over dp axes, sequence over context."""
        return NamedSharding(self.mesh, P(DATA_AXES, "context"))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def build_mesh(config: MeshConfig, devices: Sequence[jax.Device] | None = None) -> MeshInfo:
    if devices is None:
        devices = jax.devices()
    sizes = config.resolve(len(devices))
    shape = tuple(sizes[a] for a in AXIS_NAMES)
    arr = np.asarray(devices).reshape(shape)
    mesh = Mesh(arr, AXIS_NAMES)
    # expert>1: register the ambient EP mesh so moe_mlp routes the supported
    # family through the explicit a2a shard_map path (ops/moe.py — avoids
    # GSPMD's scatter-add full-rematerialization in the dispatch backward)
    from prime_rl_tpu.ops import moe as _moe

    if sizes.get("expert", 1) > 1:
        token_axes = tuple(a for a in ("replica", "fsdp", "expert")
                           if sizes.get(a, 1) > 1)
        _moe.set_ep_mesh(mesh, token_axes or ("expert",))
    else:
        _moe.set_ep_mesh(None)
    return MeshInfo(mesh=mesh, sizes=sizes)


def single_device_mesh() -> MeshInfo:
    return build_mesh(MeshConfig(replica=1, fsdp=1, expert=1, context=1, tensor=1), jax.devices()[:1])
