"""Expert-parallel MoE with explicit all-to-all dispatch (shard_map).

TPU-native analogue of the reference's DeepEP path (reference:
trainer/models/distributed/deepep.py — NVSHMEM token dispatch/combine):
tokens and experts are both sharded over the mesh's ``expert`` axis; each
rank routes its local tokens, buckets them by destination rank
(capacity-bounded, static shapes), exchanges buckets with ONE
``lax.all_to_all``, runs the local experts' ragged GEMMs, and returns
outputs with a second all_to_all — collectives ride ICI, shapes are static,
and XLA overlaps the a2a with the GEMMs.

This complements the GSPMD path in ops/moe.py (`moe_mlp`), which shards the
EXPERT weights over the axis and lets the compiler insert collectives while
activations stay replicated across `expert` — the right choice when the
expert axis is orthogonal to the data axes. `moe_mlp_ep` is for the fused
dp==ep layout (large-scale serving/training where activations are sharded
over the same ranks that hold the experts).

Capacity semantics (GShard/Switch): each rank accepts at most
``capacity`` tokens from each peer; overflow pairs are DROPPED (their
combine weight never enters the output — the token keeps its other experts'
contributions). ``capacity_factor`` ≥ ep is exact (no drops possible).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from prime_rl_tpu.ops.moe import route_topk


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def moe_mlp_ep(
    x: jax.Array,  # [T, D], T sharded over ``token_axes``
    router_w: jax.Array,  # [D, E] replicated
    w_gate: jax.Array,  # [E, D, M] sharded over experts (axis 0)
    w_up: jax.Array,
    w_down: jax.Array,  # [E, M, D]
    top_k: int,
    norm_topk_prob: bool,
    mesh: jax.sharding.Mesh,
    capacity_factor: float = 2.0,
    token_axes: tuple[str, ...] = ("expert",),
    **route_kwargs,
) -> tuple[jax.Array, "RouterOutput", jax.Array]:
    """Returns (output [T, D], RouterOutput with global [T, K] ids/weights,
    dropped-pair fraction scalar).

    ``token_axes``: mesh axes the token dim is sharded over (must include
    "expert"; e.g. ("replica", "fsdp", "expert") in the trainer, where each
    dp row forms its own ep group). The dispatch/combine all_to_all runs
    over "expert" only — the reference's ``ep = dp_shard_in_ep x cp`` layout
    (parallel_dims.py:82-152) expressed as mesh axes."""
    from prime_rl_tpu.ops.moe import RouterOutput

    ep = mesh.shape["expert"]
    e = router_w.shape[1]
    if e % ep != 0:
        raise ValueError(f"{e} experts not divisible by expert axis {ep}")
    e_local = e // ep
    t = x.shape[0]
    shard_n = 1
    for a in token_axes:
        shard_n *= mesh.shape[a]
    if t % shard_n != 0:
        raise ValueError(f"{t} tokens not divisible by token shards {shard_n}")
    t_local = t // shard_n
    # per-(src, dst) bucket capacity (static): even split + slack
    capacity = _round_up(max(1, int(capacity_factor * t_local * top_k / ep)), 8)

    def fn(x_l, router_w, wg_l, wu_l, wd_l):
        tl, d = x_l.shape
        routing = route_topk(x_l, router_w, top_k, norm_topk_prob, **route_kwargs)
        lb = jax.lax.pmean(routing.load_balance_loss, token_axes)
        ent = jax.lax.pmean(routing.router_entropy, token_axes)
        flat_e = routing.expert_ids.reshape(-1)  # [tl*K]
        flat_w = routing.weights.reshape(-1)
        flat_tok = jnp.repeat(jnp.arange(tl, dtype=jnp.int32), top_k)
        dst = flat_e // e_local  # destination rank per pair

        # slot of each pair within its destination bucket (order of arrival)
        one_hot = jax.nn.one_hot(dst, ep, dtype=jnp.int32)  # [P, ep]
        slot = jnp.cumsum(one_hot, axis=0) * one_hot - one_hot  # pos within dst
        slot = jnp.sum(slot, axis=1)  # [P]
        keep = slot < capacity
        dropped = 1.0 - jnp.mean(keep.astype(jnp.float32))

        # scatter pairs into send buckets [ep, capacity, ...]
        flat_idx = jnp.where(keep, dst * capacity + slot, ep * capacity)  # overflow bin
        payload = jnp.zeros((ep * capacity + 1, d), x_l.dtype).at[flat_idx].set(
            jnp.take(x_l, flat_tok, axis=0))[:-1].reshape(ep, capacity, d)
        send_e = jnp.full((ep * capacity + 1,), 0, jnp.int32).at[flat_idx].set(
            flat_e % e_local)[:-1].reshape(ep, capacity)
        send_valid = jnp.zeros((ep * capacity + 1,), jnp.bool_).at[flat_idx].set(
            keep)[:-1].reshape(ep, capacity)

        # dispatch: bucket j of each rank lands on rank j
        recv = jax.lax.all_to_all(payload, "expert", split_axis=0, concat_axis=0
                                  ).reshape(ep * capacity, d)
        recv_e = jax.lax.all_to_all(send_e, "expert", split_axis=0, concat_axis=0
                                    ).reshape(ep * capacity)
        recv_valid = jax.lax.all_to_all(send_valid, "expert", split_axis=0,
                                        concat_axis=0).reshape(ep * capacity)

        # local ragged GEMMs over the received set, sorted by local expert.
        # Invalid slots carry zero payload and expert 0 — compute is wasted
        # on them but their output returns to a zeroed slot (weight unused).
        recv_e = jnp.where(recv_valid, recv_e, 0)
        order = jnp.argsort(recv_e)
        xs = jnp.take(recv, order, axis=0)
        sorted_e = jnp.take(recv_e, order)
        group_sizes = jnp.zeros((e_local,), jnp.int32).at[recv_e].add(1)
        gate = jax.lax.ragged_dot(xs, wg_l, group_sizes,
                                  preferred_element_type=jnp.float32)
        up = jax.lax.ragged_dot(xs, wu_l, group_sizes,
                                preferred_element_type=jnp.float32)
        h = (jax.nn.silu(gate) * up).astype(x_l.dtype)
        out_sorted = jax.lax.ragged_dot(h, wd_l, group_sizes,
                                        preferred_element_type=jnp.float32)
        # unsort back to bucket order
        out_recv = jnp.zeros_like(out_sorted).at[order].set(out_sorted)

        # combine: send results back to the owning ranks
        back = jax.lax.all_to_all(out_recv.reshape(ep, capacity, d).astype(x_l.dtype),
                                  "expert", split_axis=0, concat_axis=0)
        back = back.reshape(ep * capacity, d)  # bucket j = my pairs sent to rank j

        w_slot = jnp.zeros((ep * capacity + 1,), jnp.float32).at[flat_idx].set(
            jnp.where(keep, flat_w, 0.0))[:-1]
        tok_slot = jnp.zeros((ep * capacity + 1,), jnp.int32).at[flat_idx].set(
            flat_tok)[:-1]
        contrib = back.astype(jnp.float32) * w_slot[:, None]
        out = jnp.zeros((tl, d), jnp.float32).at[tok_slot].add(contrib)
        # drop fraction averaged over ranks
        dropped = jax.lax.pmean(dropped, token_axes)
        return (out.astype(x_l.dtype), routing.expert_ids, routing.weights,
                lb, ent, dropped)

    tok_spec = P(token_axes)
    out, ids, weights, lb, ent, dropped = shard_map(
        fn, mesh=mesh,
        in_specs=(tok_spec, P(), P("expert"), P("expert"), P("expert")),
        out_specs=(tok_spec, tok_spec, tok_spec, P(), P(), P()),
        check_rep=False,
    )(x, router_w, w_gate, w_up, w_down)
    return out, RouterOutput(ids, weights, lb, ent), dropped
