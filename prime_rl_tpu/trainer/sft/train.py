"""SFT train loop (reference: trainer/sft/train.py:61-131): shares the
model / mesh / jitted-step / checkpoint stack with the RL trainer — SFT is
the RL step with only the CE component active (ce_weights = loss mask,
rl_weights = 0)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from prime_rl_tpu.configs.trainer import SFTConfig
from prime_rl_tpu.models.base import get_spec
from prime_rl_tpu.parallel.mesh import build_mesh
from prime_rl_tpu.trainer import step as step_lib
from prime_rl_tpu.trainer.ckpt import CheckpointManager, Progress, abstract_train_state
from prime_rl_tpu.trainer.optim import make_optimizer
from prime_rl_tpu.trainer.perf import PerfCounter
from prime_rl_tpu.trainer.sft.data import setup_sft_loader
from prime_rl_tpu.trainer.step import Scales, init_train_state, make_train_step
from prime_rl_tpu.trainer.weights import WeightCheckpointManager, load_hf_weights
from prime_rl_tpu.utils.logger import get_logger, setup_logger
from prime_rl_tpu.utils.monitor import setup_monitor


def train(config: SFTConfig) -> None:
    from prime_rl_tpu.utils.pathing import logs_dir

    setup_logger(
        config.log.level, config.log.json_logs, logs_dir(config.output_dir) / "sft.log"
    )
    logger = get_logger()
    mesh_info = build_mesh(config.mesh)
    spec = get_spec(config.model.name, num_layers=config.model.debug.num_layers)
    logger.info(f"SFT: model={config.model.name} mesh={mesh_info.sizes} params≈{spec.num_params()/1e6:.0f}M")

    # the default trainer.loss config is unused by SFT (CE-only batches), but
    # the shared step still needs one to trace the rl component
    from prime_rl_tpu.configs.trainer import DefaultLossConfig

    loss_cfg = DefaultLossConfig()
    optimizer, schedule = make_optimizer(config.optimizer, config.scheduler, config.grad_clip)

    init_params = None
    if not config.model.debug.random_init:
        try:
            from pathlib import Path

            if (Path(config.model.name) / "model.safetensors").exists():
                init_params = load_hf_weights(config.model.name, spec)
        except Exception as e:  # pragma: no cover
            logger.warning(f"could not load pretrained weights: {e}; random init")
    state = init_train_state(spec, mesh_info, optimizer, seed=config.seed, params=init_params)
    train_step = make_train_step(spec, config.model, loss_cfg, optimizer, mesh_info)

    ckpt_mgr = CheckpointManager(config.output_dir, config.ckpt)
    weight_mgr = WeightCheckpointManager(config.output_dir, config.weight_ckpt, spec)
    monitor = setup_monitor(config.monitor, config.output_dir)

    progress = Progress()
    if config.ckpt.resume_step is not None:
        state, progress = ckpt_mgr.load(abstract_train_state(state), config.ckpt.resume_step)
        logger.info(f"resumed from step {progress.step}")

    tokenizer = None
    if config.data.type != "fake":
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(config.tokenizer.name or config.model.name)
    loader = setup_sft_loader(config.data, tokenizer)

    perf = PerfCounter(spec.flops_per_token(config.data.seq_len), mesh_info.mesh.size)
    max_steps = config.max_steps or 10**9
    bench = config.bench
    while progress.step < max_steps:
        batch, counts = loader.next_batch()
        tokens = int(batch.loss_mask.size)
        batch = step_lib.put_batch(jax.tree.map(jnp.asarray, batch), mesh_info)
        scales = Scales(
            rl=jnp.float32(1.0),  # rl component carries zero weights
            ce=jnp.float32(max(counts["ce"], 1)),
            ref_kl=jnp.float32(1.0),
        )
        t0 = time.perf_counter()
        state, metrics = train_step(state, batch, scales)
        loss = float(metrics["loss"])
        dt = time.perf_counter() - t0
        progress.step += 1
        progress.total_tokens += tokens
        perf.record(dt, tokens)

        record = {
            "loss": loss,
            "nll": float(metrics["nll"].mean) if "nll" in metrics else None,
            "grad_norm": float(metrics["grad_norm"]),
            "lr": float(schedule(progress.step)),
            "tokens_per_sec": perf.tokens_per_sec,
            "mfu": perf.mfu(),
            "step_time_s": dt,
            "total_tokens": progress.total_tokens,
        }
        monitor.log(record, progress.step)
        logger.info(
            f"step {progress.step}: loss={loss:.4f} nll={record['nll']:.4f} "
            f"tps={perf.tokens_per_sec:,.0f} ({dt*1e3:.0f} ms)"
        )

        if bench is None and progress.step % config.ckpt.interval == 0:
            ckpt_mgr.save(state, progress)
        if bench is None and progress.step % config.weight_ckpt.interval == 0:
            weight_mgr.save(state.params, progress.step)
        if bench is not None and progress.step >= bench.warmup_steps + bench.steps:
            break

    if bench is None:
        ckpt_mgr.save(state, progress)
    monitor.finalize()
    logger.info("SFT done")
