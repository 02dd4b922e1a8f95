"""Benchmark harness: RL train step / decode throughput on the flagship model.

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...} to stdout —
one after EVERY measured step (flushed, cumulative), so a run killed by a
tunnel flap or driver timeout still leaves its best number on stdout (round 3
lost its only driver-visible perf datum to exactly this: BENCH_r03.json
rc=124 with no output). The LAST line is the final result. Extra resilience:

- internal deadline (--deadline, default 540 s): when it expires the bench
  emits the final JSON from the steps measured so far and exits 0 instead of
  being killed emptyhanded;
- one automatic retry: a fatal device/tunnel error re-execs the bench once
  with --no-retry (a dead PJRT connection cannot be recovered in-process).

Baseline: reference Qwen3-0.6B RL full 16k seq on 1xH100 = 11.90k tok/s
(BASELINE.md, reference benchmarks/results/BENCHMARKS.md:29). Checked-in
regression baselines: benchmarks/baselines/*.json, gated by
tests/tpu/test_benchmark_regression.py (reference:
tests/integration/test_benchmark_regression.py).

Usage: python bench.py [--mode train|decode] [--seq-len 16384] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time


BASELINE_TOKENS_PER_SEC = 11_900.0  # Qwen3-0.6B RL, 16k seq, 1xH100 (BASELINE.md)


class _Deadline(Exception):
    pass


def _install_deadline(seconds: int) -> None:
    def _raise(signum, frame):
        raise _Deadline()

    signal.signal(signal.SIGALRM, _raise)
    signal.alarm(max(1, seconds))


def _emit(metric: str, value: float, unit: str, vs_baseline, *, partial: bool,
          steps: int, extra: dict | None = None) -> None:
    rec = {"metric": metric, "value": round(value, 1), "unit": unit,
           "vs_baseline": (round(vs_baseline, 3) if vs_baseline else None),
           "partial": partial, "steps": steps}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="Qwen/Qwen3-0.6B")
    p.add_argument("--mode", choices=["train", "decode"], default="train")
    p.add_argument("--seq-len", type=int, default=16384)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--micro-batches", type=int, default=4)
    p.add_argument("--micro-batch-rows", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=64, help="decode: concurrent slots"
                   " (decode at RL-serving batch amortizes op dispatch over"
                   " decode_block on-device steps; throughput scales with slots)")
    p.add_argument("--gen-tokens", type=int, default=128, help="decode: tokens per request")
    p.add_argument("--mixed-lengths", action="store_true",
                   help="decode: RL-shaped length spread [gen/4, gen] per "
                        "request (tail/refill behavior under continuous batching)")
    p.add_argument("--decode-block", type=int, default=8,
                   help="on-device decode steps per dispatched program")
    p.add_argument("--quantize", default=None,
                   help="decode: weight-only quantization (int8) — halves the"
                        " weight bandwidth that dominates small-batch decode")
    p.add_argument("--remat", default=None,
                   help="activation-checkpoint mode: none|full|save_attn|offload_attn|selective")
    p.add_argument("--optimizer", default=None,
                   help="optimizer type override: adamw|adamw_8bit|adafactor_mom|...")
    p.add_argument("--master-dtype", default=None, help="float32|bfloat16 (SR applies)")
    p.add_argument("--quantized-compute", default=None,
                   help="train: int8 = MLP GEMMs on the int8 MXU (A/B lever;"
                        " ops/int8_linear.py)")
    p.add_argument("--lora", type=int, default=0,
                   help="train: LoRA rank (0 = full finetune) — lets models"
                        " whose full state exceeds HBM train on one chip"
                        " (reference benchmark rows: RL LoRA r16)")
    p.add_argument("--offload-optimizer", action="store_true",
                   help="park optimizer state in host memory (long-context)")
    p.add_argument("--offload-params", action="store_true",
                   help="also park f32 masters in host memory (64k lever)")
    p.add_argument("--block-q", type=int, default=None)
    p.add_argument("--block-kv", type=int, default=None)
    p.add_argument("--attn-impl", default=None, help="auto|pallas|xla")
    p.add_argument("--grad-accum-dtype", default=None, help="float32|bfloat16")
    p.add_argument("--dispatch-micro-batches", action="store_true",
                   help="one device program per micro-batch (bounds program wall time)")
    p.add_argument("--deadline", type=int, default=540,
                   help="seconds before the bench self-terminates with partial results")
    p.add_argument("--no-retry", action="store_true",
                   help="internal: disables the re-exec retry (set on the retry)")
    p.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    args = p.parse_args()

    if not args.cpu:
        # fast-fail when the TPU tunnel is dead (observed: a plain
        # jax.devices() blocks indefinitely, which would silently eat the
        # whole bench budget). Probe in a subprocess with its own timeout so
        # THIS process never touches a wedged backend.
        import subprocess

        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=300, check=True, capture_output=True)
        except subprocess.TimeoutExpired:
            print("bench: TPU runtime unreachable (device probe timed out "
                  "after 300 s) — no measurement possible", file=sys.stderr)
            sys.exit(3)
        except subprocess.CalledProcessError as e:
            print(f"bench: device probe failed: {e.stderr[-500:]}", file=sys.stderr)
            sys.exit(3)

    _install_deadline(args.deadline)
    try:
        if args.mode == "decode":
            bench_decode(args)
        else:
            bench_train(args)
    except _Deadline:
        # partial results were already streamed per-step; exit clean so the
        # driver records the last stdout line
        print("bench: internal deadline hit; last emitted line is the result",
              file=sys.stderr)
        sys.exit(0)
    except Exception as e:  # tunnel flap / device loss: one re-exec retry
        print(f"bench: fatal error: {type(e).__name__}: {e}", file=sys.stderr)
        if args.no_retry:
            raise
        print("bench: retrying once (re-exec)", file=sys.stderr)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__),
                                  *sys.argv[1:], "--no-retry"])


def bench_train(args) -> None:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from prime_rl_tpu.configs import MeshConfig, TrainerConfig
    from prime_rl_tpu.models.base import get_spec
    from prime_rl_tpu.parallel.mesh import build_mesh
    from prime_rl_tpu.trainer import step as step_lib
    from prime_rl_tpu.trainer.optim import make_optimizer
    from prime_rl_tpu.trainer.perf import PerfCounter, device_peak_flops
    from prime_rl_tpu.trainer.rl.data import FakeDataLoader
    from prime_rl_tpu.trainer.step import Scales, init_train_state, make_train_step

    n_dev = len(jax.devices())
    mesh_info = build_mesh(MeshConfig(fsdp=-1))
    # default to the measured speed-of-light recipe on TPU (r4): int8-moment
    # AdamW + bf16 masters shrink state HBM enough that save_attn fits at
    # <=32k, lifting 16k from 58.4% to 67.9% MFU. 64k+ still needs full
    # remat (save_attn OOMs); explicit flags always win.
    on_tpu = not args.cpu and jax.default_backend() not in ("cpu",)
    if on_tpu and args.seq_len <= 32768:
        args.remat = args.remat or "save_attn"
        args.optimizer = args.optimizer or "adamw_8bit"
        args.master_dtype = args.master_dtype or "bfloat16"
    opt_override = {}
    if args.optimizer:
        opt_override["type"] = args.optimizer
    if args.master_dtype:
        opt_override["master_dtype"] = args.master_dtype
    cfg = TrainerConfig(optimizer=opt_override) if opt_override else TrainerConfig()
    cfg.model.name = args.model
    cfg.model.seq_len = args.seq_len
    if args.remat:
        cfg.model.ac.mode = args.remat
    if args.block_q:
        cfg.model.attn.block_q = args.block_q
    if args.block_kv:
        cfg.model.attn.block_kv = args.block_kv
    if args.attn_impl:
        cfg.model.attn.impl = args.attn_impl
    if args.grad_accum_dtype:
        cfg.model.grad_accum_dtype = args.grad_accum_dtype
    if args.quantized_compute:
        cfg.model.quantized_compute = args.quantized_compute
    spec = get_spec(args.model)

    optimizer, _sched = make_optimizer(cfg.optimizer, cfg.scheduler, cfg.grad_clip)
    base_params = None
    if args.lora > 0:
        from prime_rl_tpu.configs.shared import LoRAConfig
        from prime_rl_tpu.trainer.step import init_base_params, init_lora_train_state

        cfg.model.lora = LoRAConfig(rank=args.lora, alpha=2.0 * args.lora)
        base_params = init_base_params(spec, mesh_info, seed=0)
        state = init_lora_train_state(spec, cfg.model.lora, mesh_info, optimizer, seed=0)
        state_out_shardings = None
    else:
        state = init_train_state(spec, mesh_info, optimizer, seed=0,
                                 offload_optimizer=args.offload_optimizer,
                                 offload_params=args.offload_params,
                                 master_dtype=getattr(cfg.optimizer, "master_dtype", "float32"))
        state_out_shardings = (
            jax.tree.map(lambda x: x.sharding, state)
            if (args.offload_optimizer or args.offload_params) else None
        )
    train_step = make_train_step(spec, cfg.model, cfg.loss, optimizer, mesh_info,
                                 base_params=base_params,
                                 state_out_shardings=state_out_shardings,
                                 optimizer_cfg=cfg.optimizer, schedule=_sched,
                                 grad_clip=cfg.grad_clip,
                                 dispatch_micro_batches=args.dispatch_micro_batches)

    loader = FakeDataLoader(
        spec.vocab_size, args.seq_len,
        micro_batch_rows=args.micro_batch_rows,
        num_micro_batches=args.micro_batches,
        variable_lengths=False,
    )
    tokens_per_batch = args.seq_len * args.micro_batch_rows * args.micro_batches

    import numpy as np

    perf = PerfCounter(
        flops_per_token=spec.flops_per_token(args.seq_len), n_devices=n_dev
    )
    measured = 0
    step_rates: list[float] = []
    for i in range(args.warmup + args.steps):
        batch, counts = loader.next_batch()
        batch = step_lib.put_batch(jax.tree.map(jnp.asarray, batch), mesh_info)
        scales = Scales(
            rl=jnp.float32(max(counts["rl"], 1)),
            ce=jnp.float32(max(counts["ce"], 1)),
            ref_kl=jnp.float32(max(counts["ref_kl"], 1)),
        )
        t0 = time.perf_counter()
        state, metrics = train_step(state, batch, scales)
        # force a host transfer: on some platforms block_until_ready returns
        # before the enqueued execution actually finishes
        float(metrics["loss"])
        dt = time.perf_counter() - t0
        print(
            f"step {i}: {dt * 1e3:.1f} ms, {tokens_per_batch / dt:,.0f} tok/s"
            + (" (warmup)" if i < args.warmup else ""),
            file=sys.stderr,
        )
        if i >= args.warmup:
            perf.record(dt, tokens_per_batch)
            measured += 1
            step_rates.append(tokens_per_batch / dt)
            # stream the running result after EVERY measured step. The
            # headline value is the MEDIAN per-step rate: a single tunnel
            # stall (one 500 s step has been observed mid-bench) must not
            # poison the run's number; mean/std ride along for the
            # regression baselines.
            med = float(np.median(step_rates))
            _emit("rl_train_tokens_per_sec", med, "tok/s",
                  med / BASELINE_TOKENS_PER_SEC,
                  partial=(measured < args.steps), steps=measured,
                  extra={"mfu": round(perf.mfu() * med / max(perf.tokens_per_sec, 1e-9), 4),
                         "mean": round(float(np.mean(step_rates)), 1),
                         "std": round(float(np.std(step_rates)), 1)})

    # DEVICE-rate measurement (VERDICT r4 next-round #2): K steps dispatched
    # back-to-back with ONE sync at the end — per-dispatch host/tunnel
    # latency amortizes K-fold, so this number tracks the silicon, not the
    # tunnel's mood. The per-step wall rate above stays the headline (driver
    # continuity); regressions gate on this one when the baseline carries it.
    k_pipe = min(args.steps, 5)
    pre = []
    for _ in range(k_pipe):
        b, c = loader.next_batch()
        pre.append((
            step_lib.put_batch(jax.tree.map(jnp.asarray, b), mesh_info),
            Scales(rl=jnp.float32(max(c["rl"], 1)), ce=jnp.float32(max(c["ce"], 1)),
                   ref_kl=jnp.float32(max(c["ref_kl"], 1))),
        ))
    t0 = time.perf_counter()
    m = None
    for b, s in pre:
        state, m = train_step(state, b, s)
    float(m["loss"])
    dt_pipe = time.perf_counter() - t0
    device_rate = k_pipe * tokens_per_batch / dt_pipe
    med = float(np.median(step_rates)) if step_rates else 0.0
    print(f"pipelined x{k_pipe}: {device_rate:,.0f} tok/s device-rate "
          f"(vs {med:,.0f} sync-per-step — the gap is dispatch latency)",
          file=sys.stderr)
    _emit("rl_train_tokens_per_sec", med, "tok/s",
          med / BASELINE_TOKENS_PER_SEC, partial=False, steps=measured,
          extra={"mfu": round(perf.mfu() * med / max(perf.tokens_per_sec, 1e-9), 4),
                 "mean": round(float(np.mean(step_rates)), 1) if step_rates else 0.0,
                 "std": round(float(np.std(step_rates)), 1) if step_rates else 0.0,
                 "device_tok_s": round(device_rate, 1),
                 "device_mfu": round(
                     perf.mfu() * device_rate / max(perf.tokens_per_sec, 1e-9), 4)})

    print(
        f"model={args.model} seq={args.seq_len} devices={n_dev} "
        f"peak={device_peak_flops() / 1e12:.0f}TF MFU={perf.mfu() * 100:.1f}%",
        file=sys.stderr,
    )


def bench_decode(args) -> None:
    """Steady-state decode throughput of the sampling engine: ``batch_size``
    concurrent requests generating ``gen_tokens`` each, measured in waves so
    partial results stream out between waves."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from prime_rl_tpu.models import get_family
    from prime_rl_tpu.models.base import get_spec
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    spec = get_spec(args.model)
    family = get_family(spec)
    import jax.numpy as jnp

    params = family.init(spec, jax.random.key(0), dtype=jnp.bfloat16)
    max_len = max(512, args.gen_tokens + 128)
    pages_needed = args.batch_size * (-(-max_len // 64)) + 16
    cache_cfg = CacheConfig(
        num_pages=pages_needed, page_size=64, max_slots=args.batch_size,
        max_seq_len=max_len,
    )
    engine = Engine(params, spec, cache_cfg, lookahead=16,
                    decode_block=args.decode_block, quantize=args.quantize,
                    donate_startup_params=True)
    del params  # the stacked original (8 GB at 4B) must die: donation cannot
    # alias stacked buffers into the engine's per-layer slices
    rng = np.random.default_rng(0)
    prompts = [
        [int(x) for x in rng.integers(1, min(spec.vocab_size, 1000), 64)]
        for _ in range(args.batch_size)
    ]
    # warmup: compile prefill + the full-block decode program at full batch
    t0 = time.perf_counter()
    engine.generate(prompts, SamplingParams(
        max_tokens=args.decode_block + 1, temperature=1.0, ignore_eos=True))
    # ... and the continuous-admission path (submit + run_until_idle admits
    # into a LIVE pipeline, which compiles partial-batch prefill/refill
    # variants the pulsed generate() warmup never hits — round-5 measured
    # wave 0 paying ~30s of compile without this)
    wfuts = [engine.submit(p, SamplingParams(
        max_tokens=args.decode_block + 1, temperature=1.0, ignore_eos=True))
        for p in prompts for _ in (0, 1)]
    import threading
    wrun = threading.Thread(target=engine.run_until_idle, daemon=True)
    wrun.start()
    for f in wfuts:
        f.result(timeout=1200)
    wrun.join(timeout=60)
    print(f"warmup/compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # NOTE: no per-request seed — an explicit seed routes prefill to the
    # reproducible single-request path (ADVICE r4 #3), which would serialize
    # 64 dispatch-bound prefills and benchmark the tunnel instead of decode
    sp = SamplingParams(max_tokens=args.gen_tokens, temperature=1.0,
                        ignore_eos=True)
    sps = [sp] * args.batch_size
    if args.mixed_lengths:
        # RL-shaped tails: lengths spread uniformly in [gen/4, gen] so slots
        # free at different times and continuous admission refills them
        # (VERDICT r4 #1: tail effects at mixed request lengths)
        lens = rng.integers(max(1, args.gen_tokens // 4), args.gen_tokens + 1,
                            args.batch_size)
        sps = [SamplingParams(max_tokens=int(n), temperature=1.0,
                              ignore_eos=True) for n in lens]
    # CONTINUOUS stream, not pulsed waves: all cohorts are submitted up
    # front so admission overlaps the live decode pipeline (slots refill the
    # moment one frees — the orchestrator's in-flight pattern, and VERDICT
    # r4 #1's "admit without draining the decode pipeline"). Progress still
    # streams per wave-sized cohort for partial results.
    waves = 3
    futs = []
    t0 = time.perf_counter()
    for w in range(waves):
        futs.append([engine.submit(p, s) for p, s in zip(prompts, sps)])
    total = 0
    wave_marks = []  # (tokens_so_far, elapsed) at each cohort completion

    runner = threading.Thread(target=engine.run_until_idle, daemon=True)
    runner.start()
    for w in range(waves):
        results = [f.result(timeout=1200) for f in futs[w]]
        total += sum(len(r.token_ids) for r in results)
        total_dt = time.perf_counter() - t0
        wave_marks.append((total, total_dt))
        print(f"wave {w}: {total} tokens in {total_dt:.2f}s", file=sys.stderr)
        extra = {"slots": args.batch_size, "decode_block": args.decode_block}
        if w >= 1:
            # steady-state rate over waves >= 1: the pipeline is saturated
            # from t0 (all cohorts pre-submitted), so any residual one-off
            # cost in wave 0 (stray compile, page-table ramp) is excluded
            d_tok = total - wave_marks[0][0]
            d_t = total_dt - wave_marks[0][1]
            if d_t > 0:
                extra["steady_tok_per_sec"] = round(d_tok / d_t, 1)
        _emit("decode_tokens_per_sec", total / total_dt, "tok/s", None,
              partial=(w + 1 < waves), steps=w + 1, extra=extra)
    runner.join(timeout=60)


if __name__ == "__main__":
    main()
