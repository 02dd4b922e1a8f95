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
    spec = get_spec(config.model.name, num_layers=config.model.debug.num_layers,
                    vocab_size=config.model.debug.vocab_size)
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
    base_params = None
    if config.model.lora is not None:
        from prime_rl_tpu.trainer.step import init_base_params, init_lora_train_state

        base_params = init_base_params(spec, mesh_info, config.seed, init_params)
        state = init_lora_train_state(spec, config.model.lora, mesh_info, optimizer,
                                      config.seed)
        logger.info(f"LoRA r{config.model.lora.rank}: training adapters only "
                    "(reference scenario: sft_lora)")
    else:
        state = init_train_state(spec, mesh_info, optimizer, seed=config.seed,
                                 params=init_params,
                                 master_dtype=getattr(config.optimizer, "master_dtype", "float32"))
    train_step = make_train_step(spec, config.model, loss_cfg, optimizer, mesh_info,
                                 base_params=base_params)

    def publish_params():
        if base_params is None:
            return state.params
        from prime_rl_tpu.models.lora import merge_lora

        return merge_lora(base_params, state.params, config.model.lora, spec=spec)

    def export_adapter(step: int) -> None:
        """Standalone PEFT adapter alongside the merged snapshot."""
        if base_params is None:
            return
        from pathlib import Path as _P

        from safetensors.numpy import save_file

        from prime_rl_tpu.models.lora import adapter_state_dict
        from prime_rl_tpu.utils.pathing import weights_dir

        d = _P(weights_dir(config.output_dir, step))
        if d.exists():
            import numpy as _np

            host = jax.tree.map(lambda x: _np.asarray(jax.device_get(x)), state.params)
            (d / "adapter").mkdir(exist_ok=True)
            save_file(adapter_state_dict(host, spec, config.model.lora),
                      d / "adapter" / "adapter_model.safetensors")

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
    # fake data must stay inside the model's vocab (out-of-range ids make
    # the embedding lookup produce NaNs on some backends)
    config.data.fake_vocab = min(config.data.fake_vocab, spec.vocab_size)
    vlm = {"vlm_spec": spec if spec.vision is not None else None,
           "max_mm_patches": config.data.max_mm_patches}
    loader = setup_sft_loader(config.data, tokenizer, **vlm)

    val_loader = None
    eval_step = None
    if config.val is not None:
        val_data = config.data.model_copy(
            update={"seed": config.val.seed, "split": config.val.split}
        )
        val_loader = setup_sft_loader(val_data, tokenizer, **vlm)
        from prime_rl_tpu.trainer.step import make_loss_fn

        val_loss_fn = make_loss_fn(spec, config.model, loss_cfg,
                                   mesh_info.mesh if mesh_info.cp_size > 1 else None)
        eval_step = jax.jit(lambda p, mb, sc: val_loss_fn(p, mb, sc)[1]["nll"])

    def run_validation(step: int) -> None:
        totals, counts = 0.0, 0.0
        for _ in range(config.val.num_batches):
            vb, vcounts = val_loader.next_batch()
            vb = step_lib.put_batch(jax.tree.map(jnp.asarray, vb), mesh_info)
            sc = Scales(jnp.float32(1), jnp.float32(max(vcounts["ce"], 1)), jnp.float32(1))
            for i in range(vb.input_ids.shape[0]):
                mb = jax.tree.map(lambda x: x[i], vb)
                nll = eval_step(state.params, mb, sc)
                totals += float(nll.total)
                counts += float(nll.count)
        val_nll = totals / max(counts, 1.0)
        monitor.log({"val_nll": val_nll}, step)
        logger.info(f"validation @ step {step}: nll={val_nll:.4f}")

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

        if eval_step is not None and progress.step % config.val.interval == 0:
            run_validation(progress.step)
        if bench is None and progress.step % config.ckpt.interval == 0:
            ckpt_mgr.save(state, progress)
        if bench is None and progress.step % config.weight_ckpt.interval == 0:
            weight_mgr.save(publish_params(), progress.step)
            export_adapter(progress.step)
        if bench is not None and progress.step >= bench.warmup_steps + bench.steps:
            break

    if bench is None:
        ckpt_mgr.save(state, progress)
    monitor.finalize()
    logger.info("SFT done")
