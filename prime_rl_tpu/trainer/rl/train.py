"""RL trainer process (reference: trainer/rl/train.py:74-827): consume
TrainingBatches from the orchestrator, run the jitted learner step, publish
weight snapshots (the filesystem weight-broadcast path: HF snapshot +
STABLE marker that the orchestrator's watcher applies to the sampler pool).

Version protocol: policy v0 = initial weights published at startup; after
consuming batch ``s`` the trainer publishes v``s+1`` — the orchestrator
gates dispatch and shipment on these versions (SURVEY.md §1 process
contract)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.configs.trainer import TrainerConfig
from prime_rl_tpu.models.base import get_spec
from prime_rl_tpu.parallel.mesh import build_mesh
from prime_rl_tpu.trainer import step as step_lib
from prime_rl_tpu.trainer.batch import prepare_batch, token_counts
from prime_rl_tpu.trainer.ckpt import CheckpointManager, Progress, abstract_train_state
from prime_rl_tpu.trainer.optim import make_optimizer
from prime_rl_tpu.trainer.perf import PerfCounter
from prime_rl_tpu.trainer.rl.data import FakeDataLoader
from prime_rl_tpu.trainer.step import Scales, init_train_state, make_train_step
from prime_rl_tpu.trainer.weights import WeightCheckpointManager, load_hf_weights
from prime_rl_tpu.utils.logger import get_logger, setup_logger
from prime_rl_tpu.utils.monitor import setup_monitor
from prime_rl_tpu.utils.pathing import logs_dir


def train(config: TrainerConfig, weight_sink=None) -> None:
    """``weight_sink``: WeightBroadcastSink override (trainer/rl/broadcast.py).
    None = filesystem broadcast (snapshot per step); the colocated entrypoint
    passes a ColocatedBroadcast that swaps the live engine's params."""
    world = jax.process_count()
    rank = jax.process_index()
    is_main = rank == 0
    setup_logger(config.log.level, config.log.json_logs,
                 logs_dir(config.output_dir) / (
                     "trainer.log" if world == 1 else f"trainer_rank{rank}.log"))
    logger = get_logger()
    mesh_info = build_mesh(config.mesh)
    spec = get_spec(config.model.name, num_layers=config.model.debug.num_layers,
                    vocab_size=config.model.debug.vocab_size)
    if config.model.gdn_mxu_precision != "highest":
        from prime_rl_tpu.ops import gated_delta

        gated_delta.MXU_PRECISION = config.model.gdn_mxu_precision
    logger.info(
        f"RL trainer: model={config.model.name} mesh={mesh_info.sizes} "
        f"params≈{spec.num_params()/1e6:.0f}M seq_len={config.batch.seq_len}"
    )

    optimizer, schedule = make_optimizer(config.optimizer, config.scheduler, config.grad_clip)
    init_params = None
    if not config.model.debug.random_init:
        from pathlib import Path

        if (Path(config.model.name) / "config.json").exists():
            init_params = load_hf_weights(config.model.name, spec)

    base_params = None
    run_mgr = None
    if config.model.lora is not None:
        from prime_rl_tpu.trainer.step import init_base_params, init_lora_train_state

        base_params = init_base_params(spec, mesh_info, config.seed, init_params)
        state = init_lora_train_state(spec, config.model.lora, mesh_info, optimizer, config.seed)
        logger.info(f"LoRA r{config.model.lora.rank}: training adapters only")
        if config.multi_run:
            from prime_rl_tpu.trainer.runs import MultiRunManager

            run_mgr = MultiRunManager(
                config.output_dir, spec, config.model.lora, mesh_info, optimizer,
                max_runs=config.max_runs, seed=config.seed,
            )
            logger.info(f"multi-run: up to {config.max_runs} concurrent LoRA tenants")
    else:
        state = init_train_state(spec, mesh_info, optimizer, seed=config.seed,
                                 params=init_params,
                                 offload_optimizer=config.offload_optimizer,
                                 offload_params=config.offload_params,
                                 master_dtype=getattr(config.optimizer, "master_dtype", "float32"))
    state_out_shardings = (
        jax.tree.map(lambda x: x.sharding, state)
        if (config.offload_optimizer or config.offload_params) else None
    )
    train_step = make_train_step(spec, config.model, config.loss, optimizer, mesh_info,
                                 base_params=base_params,
                                 state_out_shardings=state_out_shardings,
                                 optimizer_cfg=config.optimizer, schedule=schedule,
                                 grad_clip=config.grad_clip,
                                 dispatch_micro_batches=config.dispatch_micro_batches)

    def publish_params():
        if base_params is None:
            return state.params
        from prime_rl_tpu.models.lora import merge_lora

        return merge_lora(base_params, state.params, config.model.lora, spec=spec)

    ckpt_mgr = CheckpointManager(config.output_dir, config.ckpt)
    weight_mgr = WeightCheckpointManager(config.output_dir, config.weight_ckpt, spec)
    monitor = setup_monitor(config.monitor, config.output_dir, "trainer")
    progress = Progress()
    if config.ckpt.resume_step is not None:
        state, progress = ckpt_mgr.load(abstract_train_state(state), config.ckpt.resume_step)
        logger.info(f"resumed from step {progress.step}")

    fake_loader = None
    receiver = None
    mb_receiver = None
    packer = None
    if config.data.type == "fake":
        fake_loader = FakeDataLoader(
            spec.vocab_size, config.data.seq_len, config.data.micro_batch_size,
            config.data.num_micro_batches, seed=config.data.seed,
        )
    elif world > 1:
        # multi-host data plane (reference: trainer/rl/packer.py + zmq
        # MicroBatch PUB/SUB): rank 0 runs the packer — receives whole
        # TrainingBatches, re-bins rows across ranks, publishes each rank's
        # feed WITH the global per-component token counts (so Scales need no
        # separate cross-process reduction)
        import threading

        from prime_rl_tpu.trainer.rl.packer import Packer
        from prime_rl_tpu.transport import (
            setup_micro_batch_receiver,
            setup_micro_batch_sender,
            setup_training_batch_receiver,
        )

        if is_main:
            tb_receiver = setup_training_batch_receiver(
                config.transport, config.output_dir, progress.step)
            mb_sender = setup_micro_batch_sender(config.transport, config.output_dir, world)
            packer = Packer(tb_receiver, mb_sender, config.batch.seq_len, world)
            threading.Thread(target=packer.run, daemon=True, name="packer").start()
            logger.info(f"packer up: re-binning for {world} ranks")
        mb_receiver = setup_micro_batch_receiver(
            config.transport, config.output_dir, rank, progress.step)
    else:
        from prime_rl_tpu.transport import setup_training_batch_receiver

        receiver = setup_training_batch_receiver(config.transport, config.output_dir, progress.step)

    # startup broadcast: publish the current policy so the sampler starts from
    # trainer weights (reference: rl/train.py:277-288)
    from prime_rl_tpu.trainer.rl.broadcast import FilesystemBroadcast, make_broadcast

    if weight_sink is None:
        weight_sink = make_broadcast(config.broadcast, weight_mgr, config.output_dir)
    # non-filesystem planes still snapshot to disk on the weight_ckpt interval
    # (eval/export/elastic-joiner sync), just not on the per-step hot path
    snapshot_interval = (
        None if isinstance(weight_sink, FilesystemBroadcast) else config.weight_ckpt.interval
    )
    def gather_params():
        """Merged policy as a HOST-complete tree: on world>1 every rank must
        participate in the allgather (a bare device_get of a globally-sharded
        array raises 'spans non-addressable devices')."""
        host = publish_params()
        if world > 1:
            from jax.experimental import multihost_utils

            host = multihost_utils.process_allgather(host, tiled=True)
        return host

    def gather_and_publish(version: int):
        host = gather_params()
        if is_main:
            weight_sink.publish(host, version)
            # adapter export happens after weight_mgr.save creates the
            # snapshot dir (the step loop) — not here, where the dir rarely
            # exists yet and the device_get of the adapter tree is wasted
        return host

    def export_adapter(version: int) -> None:
        """Standalone PEFT-style adapter next to the merged snapshot
        (reference: ckpt.py:322-517 optional separate LoRA adapter) —
        servable without a merge via /load_lora_adapter."""
        if base_params is None:
            return
        from pathlib import Path as _P

        from safetensors.numpy import save_file

        from prime_rl_tpu.models.lora import adapter_state_dict
        from prime_rl_tpu.utils import pathing

        d = _P(pathing.weights_dir(config.output_dir, version))
        if not d.exists():  # non-filesystem plane outside the snapshot interval
            return
        host = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), state.params)
        (d / "adapter").mkdir(exist_ok=True)
        save_file(adapter_state_dict(host, spec, config.model.lora),
                  d / "adapter" / "adapter_model.safetensors")

    version = progress.step
    gather_and_publish(version)
    if is_main and snapshot_interval is None:
        export_adapter(version)
    logger.info(f"published initial weights v{version}")
    skipped_publishes = False  # set when the shutdown carve-out elides publishes

    from prime_rl_tpu.utils.memory import GarbageCollection, device_memory_stats
    from prime_rl_tpu.utils.metrics_server import maybe_start_metrics_server

    metrics_server = maybe_start_metrics_server(config.metrics_server)
    gc_gate = GarbageCollection(interval=50)
    exporter = None
    if config.token_export_rows > 0 and is_main:
        from prime_rl_tpu.trainer.rl.token_export import TokenExporter

        exporter = TokenExporter(config.output_dir, config.token_export_rows)
    heartbeat = None
    if config.heartbeat_url and is_main:
        from prime_rl_tpu.utils.heartbeat import Heartbeat

        heartbeat = Heartbeat(config.heartbeat_url, config.heartbeat_interval).start()
    if config.trace_path:
        jax.profiler.start_trace(config.trace_path)

    perf = PerfCounter(spec.flops_per_token(config.batch.seq_len), mesh_info.mesh.size)
    bench = config.bench
    seen_shapes: set[tuple[int, ...]] = set()
    max_steps = config.max_steps or 10**9
    while progress.step < max_steps:
        t_wait = time.perf_counter()
        run = None
        if fake_loader is not None:
            batch, counts = fake_loader.next_batch()
        elif mb_receiver is not None:
            from prime_rl_tpu.trainer.rl.packer import wire_to_arrays

            got = None
            while got is None:
                got = mb_receiver.receive(timeout=1.0)
                if got is None and progress.step >= max_steps:
                    break
            if got is None:
                break
            _step, mbs, counts = got
            batch = wire_to_arrays(mbs, config.batch.micro_batch_size,
                                   num_micro_batches=config.batch.num_micro_batches,
                                   vlm_spec=spec if spec.vision is not None else None,
                                   max_mm_patches=max(config.batch.max_mm_patches,
                                                      counts.get("mm_pad", 0)))
            if run_mgr is not None:
                rid = next((mb.run_id for mb in mbs if mb.run_id), "run_0")
                run = run_mgr.get_or_create(rid)
                state = run.state  # tenant swap (packer path)
        else:
            tb = None
            while tb is None:
                tb = receiver.receive(timeout=1.0)
                if tb is None and progress.step >= max_steps:
                    break
            if tb is None:
                break
            batch = prepare_batch(
                tb.examples, config.batch.seq_len, config.batch.micro_batch_size,
                num_micro_batches=config.batch.num_micro_batches,
                vlm_spec=spec if spec.vision is not None else None,
                max_mm_patches=config.batch.max_mm_patches,
            )
            counts = token_counts(batch)
            if run_mgr is not None:
                run = run_mgr.get_or_create(f"run_{tb.run_idx or 0}")
                state = run.state  # tenant swap: same jit, different pytree
        wait_s = time.perf_counter() - t_wait

        if exporter is not None:
            exporter.export(progress.step, batch)
        shape_key = tuple(batch.input_ids.shape)
        if shape_key not in seen_shapes:
            seen_shapes.add(shape_key)
            logger.info(
                f"train step shape {shape_key} (compilation #{len(seen_shapes)})"
            )
        tokens = int(batch.loss_mask.size) * world
        mm_seg = getattr(batch, "mm_vis_seg_ids", None)
        mm_patches = None if mm_seg is None else int((np.asarray(mm_seg) > 0).sum())
        batch = step_lib.put_batch(
            batch if world > 1 else jax.tree.map(jnp.asarray, batch), mesh_info,
            mm_merge_unit=(spec.vision.merge_unit if spec.vision is not None else 1))
        scales = Scales(
            rl=jnp.float32(max(counts["rl"], 1)),
            ce=jnp.float32(max(counts["ce"], 1)),
            ref_kl=jnp.float32(max(counts["ref_kl"], 1)),
        )
        t0 = time.perf_counter()
        state, metrics = train_step(state, batch, scales)
        loss = float(metrics["loss"])
        dt = time.perf_counter() - t0
        progress.step += 1
        progress.total_tokens += tokens
        perf.record(dt, tokens)
        if run is not None:
            run.state = state
            run.progress.step += 1
            if run.progress.step % config.weight_ckpt.interval == 0:
                run_mgr.publish(run, base_params, run.progress.step)
            if run.progress.step % config.ckpt.interval == 0:
                run_mgr.save(run)

        # weight broadcast: v{step} — filesystem snapshot+STABLE or direct
        # in-process engine swap (colocated)
        version = progress.step
        skip_final = (
            config.final_publish_skip > 0
            and config.max_steps is not None
            and progress.step > config.max_steps - config.final_publish_skip
        )
        if skip_final and progress.step == config.max_steps - config.final_publish_skip + 1:
            skipped_publishes = True
            logger.info(
                f"skipping the final {config.final_publish_skip} publishes "
                "(one-step-off shutdown carve-out)")
        if bench is None and not skip_final:
            t_pub = time.perf_counter()
            host_params = gather_and_publish(version)
            if is_main:
                if snapshot_interval is None:
                    # filesystem plane: publish itself wrote the snapshot dir
                    export_adapter(version)
                elif progress.step % snapshot_interval == 0:
                    weight_mgr.save(host_params, version)
                    export_adapter(version)
            del host_params
            pub_s = time.perf_counter() - t_pub
        else:
            pub_s = 0.0

        record = {
            "loss": loss,
            "grad_norm": float(metrics["grad_norm"]),
            "mismatch_kl": float(metrics["mismatch_kl"].mean) if "mismatch_kl" in metrics else None,
            "entropy": float(metrics["entropy"].mean),
            "lr": float(schedule(progress.step)),
            "tokens_per_sec": perf.tokens_per_sec,
            "mfu": perf.mfu(),
            "step_time_s": dt,
            "wait_for_batch_s": wait_s,
            "publish_s": pub_s,
            "rl_tokens": counts["rl"],
        }
        if mm_patches is not None:
            record["mm_patches"] = mm_patches  # real (non-pad) vision patches
        if progress.step % 50 == 0:
            record.update(device_memory_stats())
        if is_main:
            monitor.log(record, progress.step)
        gc_gate.maybe_collect(progress.step)
        if metrics_server is not None:
            metrics_server.update({"step": progress.step, **record})
        logger.info(
            f"step {progress.step}: loss={loss:.4f} kl={record['mismatch_kl']} "
            f"ent={record['entropy']:.3f} tps={perf.tokens_per_sec:,.0f} "
            f"(step {dt*1e3:.0f} ms, wait {wait_s*1e3:.0f} ms)"
        )

        if bench is None and progress.step % config.ckpt.interval == 0:
            ckpt_mgr.save(state, progress)
        if bench is not None and progress.step >= bench.warmup_steps + bench.steps:
            break

    if config.trace_path:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {config.trace_path}")
    if metrics_server is not None:
        metrics_server.stop()
    if heartbeat is not None:
        heartbeat.stop()
    if run_mgr is not None:
        run_mgr.save_all()
    if bench is None and skipped_publishes:
        # The carve-out skipped only the ENGINE broadcast; the final trained
        # weights must still be persisted so the newest deployable snapshot
        # is v{max_steps}, matching the reference's final-broadcast carve-out
        # which still writes the checkpoint (ADVICE r4 #5). All ranks join
        # the gather (collective); only main writes.
        final_host = gather_params()
        if is_main:
            weight_mgr.save(final_host, progress.step)
            export_adapter(progress.step)
            logger.info(f"persisted final weights v{progress.step} "
                        "(broadcast elided by the shutdown carve-out)")
        del final_host
    if bench is None:
        ckpt_mgr.save(state, progress)
    if hasattr(weight_sink, "close"):
        weight_sink.close()
    monitor.finalize()
    logger.info("trainer done")
