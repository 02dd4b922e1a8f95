"""Microbenchmark: DSA sparse-MLA attention implementations on the real chip.

Usage: python scripts/bench_sparse_mla.py [--impl xla|pallas] [--bwd]
Shapes default to a GLM-4.6-class layer scaled to one v5e:
H=64 heads, Dq=576 latent+rope, v_dim=512, topk=2048, S=Sk=4096.

Speed-of-light: the gather traffic alone is S*topk*1152 B; at ~800 GB/s
HBM that bounds the fwd at ~12 ms for the default shape.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", default="xla",
                   choices=["xla", "pallas", "indexer", "indexer-approx"])
    p.add_argument("--S", type=int, default=4096)
    p.add_argument("--H", type=int, default=64)
    p.add_argument("--topk", type=int, default=2048)
    p.add_argument("--dq", type=int, default=576)
    p.add_argument("--dv", type=int, default=512)
    p.add_argument("--bwd", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    S, H, T, Dq, Dv = args.S, args.H, args.topk, args.dq, args.dv
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, H, Dq)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((S, Dq)), jnp.bfloat16)
    # causal top-k-looking indices: token i selects min(T, i+1) of [0, i]
    idx = np.full((S, T), S, np.int32)
    for i in range(S):
        n = min(T, i + 1)
        idx[i, :n] = rng.choice(i + 1, size=n, replace=False)
    indices = jnp.asarray(idx)
    scale = Dq ** -0.5

    if args.impl.startswith("indexer"):
        # time the phase-1 indexer (bf16 logits + top-k) alone; GLM-4.6
        # indexer dims: 64 heads x 128 dim
        from prime_rl_tpu.ops.sparse_mla import mla_topk_indices

        hi, di = 32, 128
        q_idx = jnp.asarray(rng.standard_normal((S, hi, di)), jnp.bfloat16)
        k_idx = jnp.asarray(rng.standard_normal((S, di)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((S, hi)), jnp.bfloat16)
        ks = jnp.zeros((S,), jnp.int32)
        ke = jnp.arange(1, S + 1, dtype=jnp.int32)
        method = "approx" if args.impl.endswith("approx") else "exact"
        fn = jax.jit(lambda qi, ki: mla_topk_indices(
            qi, ki, w, ks, ke, T, method=method))
        out = fn(q_idx, k_idx)
        _ = int(jnp.sum(out))
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(q_idx, k_idx)
            _ = int(jnp.sum(out))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        flops = 2 * S * S * hi * di
        print(f"{args.impl} S={S} T={T}: {dt*1e3:.2f} ms | logits "
              f"{flops/dt/1e12:.1f} TF/s")
        return

    if args.impl == "xla":
        from prime_rl_tpu.ops.sparse_mla import sparse_mla_attention as attn
    else:
        from prime_rl_tpu.ops.sparse_mla_pallas import sparse_mla_attention as attn

    if args.bwd:
        def loss(q, kv):
            return jnp.sum(attn(q, kv, indices, scale, Dv).astype(jnp.float32))

        fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    else:
        fn = jax.jit(lambda q, kv: attn(q, kv, indices, scale, Dv))

    out = fn(q, kv)
    jax.block_until_ready(out)
    # axon: block_until_ready can return early — force a transfer
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = fn(q, kv)
        _ = float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    gather_gb = S * T * Dq * 2 / 1e9
    flops = S * 2 * H * T * (Dq + Dv) * (3 if args.bwd else 1)
    print(f"{args.impl} {'bwd' if args.bwd else 'fwd'} S={S} H={H} T={T}: "
          f"{dt*1e3:.2f} ms | gather {gather_gb/dt:.0f} GB/s "
          f"| {flops/dt/1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
