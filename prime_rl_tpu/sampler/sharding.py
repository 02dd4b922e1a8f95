"""Tensor-parallel serving: shardings for the engine's params and KV pools.

The reference serves large models with vLLM tensor_parallel_size > 1
(reference: docs/inference.md:66-77). Here the engine's param pytree and
paged KV pools get NamedShardings over a ``tensor`` mesh axis and the jitted
prefill/decode programs partition under GSPMD; attention itself is
embarrassingly parallel over kv heads, so the decode kernel runs under
shard_map with zero collectives (one psum rides the o/down projections,
exactly like megatron-style TP).

Rules are name+shape based over the serving layout (sampler/model.
unstack_params): projections shard their wide dim, experts shard their
hidden dim, anything unknown replicates — GSPMD keeps every choice correct,
the rules only decide efficiency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

# serving-layout layer keys -> which dim shards over "tensor"
_SHARD_LAST = {"q", "k", "v", "gate", "up", "q_b", "kv_b", "in_proj_qkvz",
               "shared_gate", "shared_up"}
_SHARD_FIRST = {"o", "down", "shared_down"}
_SHARD_EXPERT_LAST = {"expert_gate", "expert_up"}
_SHARD_EXPERT_MID = {"expert_down"}


def _spec_for(key: str, arr, tp: int) -> P:
    shape = arr.shape
    if key in _SHARD_LAST and arr.ndim == 2 and shape[-1] % tp == 0:
        return P(None, "tensor")
    if key in _SHARD_FIRST and arr.ndim == 2 and shape[0] % tp == 0:
        return P("tensor", None)
    if key in _SHARD_EXPERT_LAST and arr.ndim == 3 and shape[-1] % tp == 0:
        return P(None, None, "tensor")
    if key in _SHARD_EXPERT_MID and arr.ndim == 3 and shape[1] % tp == 0:
        return P(None, "tensor", None)
    return P()


def shard_serving_params(params, mesh: Mesh):
    """device_put the serving param pytree under TP shardings (lm_head
    shards its vocab dim; embed and norms replicate)."""
    tp = mesh.shape.get("tensor", 1)

    def put(spec, x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = [
                {lk: (lv if not hasattr(lv, "shape")
                      else put(_spec_for(lk, lv, tp), lv))
                 for lk, lv in layer.items()}
                for layer in v
            ]
        elif k == "lm_head" and v.ndim == 2 and v.shape[-1] % tp == 0:
            out[k] = put(P(None, "tensor"), v)
        elif k == "vision":
            out[k] = jax.tree.map(lambda x: put(P(), x), v)
        else:
            out[k] = jax.tree.map(lambda x: put(P(), x), v)
    return out


def pool_spec(num_kv_heads: int, tp: int) -> P:
    """KV pool [NKV, NP, PS, HD]: shard the head axis when it divides."""
    if num_kv_heads % tp == 0 and tp > 1:
        return P("tensor", None, None, None)
    return P()


def shard_pools(pools: list, mesh: Mesh, tp: int):
    out = []
    for b in pools:
        if b is None:
            out.append(None)
            continue
        spec = pool_spec(b.shape[0], tp)
        out.append(jax.device_put(b, NamedSharding(mesh, spec)))
    return out


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
