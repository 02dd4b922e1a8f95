"""``python -m prime_rl_tpu.entrypoints.inference @ config.toml [--flags]``
(reference: entrypoints/inference.py — standalone sampling server)."""

from __future__ import annotations

from prime_rl_tpu.configs import InferenceConfig, parse_config
from prime_rl_tpu.utils.jax_env import configure_jax


def build_server(config: InferenceConfig):
    import jax
    import jax.numpy as jnp

    from prime_rl_tpu.models.base import get_spec
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine
    from prime_rl_tpu.sampler.server import InferenceServer
    from prime_rl_tpu.utils.logger import get_logger, setup_logger
    from prime_rl_tpu.utils.pathing import logs_dir

    setup_logger(config.log.level, config.log.json_logs,
                 logs_dir(config.output_dir) / "inference.log")
    logger = get_logger()
    spec = get_spec(config.model.name, num_layers=config.model.debug.num_layers,
                    vocab_size=config.model.debug.vocab_size)

    if config.model.debug.random_init:
        from prime_rl_tpu.models import get_family

        params = get_family(spec).init(spec, jax.random.key(config.seed), dtype=jnp.bfloat16)
    else:
        from pathlib import Path

        from prime_rl_tpu.trainer.weights import load_hf_weights

        if not (Path(config.model.name) / "config.json").exists():
            raise FileNotFoundError(
                f"{config.model.name} is not a local checkpoint dir; use "
                f"--model.debug.random-init for offline smoke tests"
            )
        params = load_hf_weights(config.model.name, spec)

    num_pages = config.kv.num_pages
    if num_pages is None:
        # size the pool from the HBM budget left after weights
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)() or {}
        hbm = stats.get("bytes_limit", 16 * 1024**3)
        weight_bytes = spec.num_params() * 2
        page_bytes = 2 * spec.num_layers * spec.kv_dim * config.kv.page_size * 2
        budget = max(hbm * config.kv.hbm_utilization - weight_bytes, page_bytes * 16)
        num_pages = max(16, int(budget // page_bytes))
    cache_cfg = CacheConfig(
        num_pages=num_pages,
        page_size=config.kv.page_size,
        max_slots=config.scheduler.max_batch_size,
        max_seq_len=config.max_model_len,
    )
    logger.info(
        f"engine: model={config.model.name} pages={num_pages}x{config.kv.page_size} "
        f"slots={cache_cfg.max_slots} max_len={config.max_model_len}"
    )
    mesh = None
    if len(jax.devices()) > 1:
        # TP serving (reference: vLLM tensor_parallel_size): shard params +
        # KV pools over the mesh's "tensor" axis; head-local decode attention
        from prime_rl_tpu.parallel.mesh import build_mesh

        mesh = build_mesh(config.mesh).mesh
        logger.info(f"serving mesh: {dict(mesh.shape)}")
    engine = Engine(params, spec, cache_cfg, seed=config.seed, quantize=config.quantization,
                    donate_startup_params=True,
                    lora_config=config.lora,
                    collect_routed_experts=config.collect_routed_experts,
                    mesh=mesh, lookahead=config.scheduler.lookahead,
                    decode_block=config.scheduler.decode_block)
    del params  # free the stacked original — the engine holds its own layout
    if config.scheduler.warmup_requests > 0:
        engine.warmup(config.scheduler.warmup_requests)

    from prime_rl_tpu.renderers.tokenizer import get_tokenizer

    tokenizer = get_tokenizer(config.tokenizer.name or config.model.name)
    server = InferenceServer(engine, config.model.name, tokenizer,
                             role=config.server.role)
    if config.weight_plane is not None:
        from prime_rl_tpu.sampler.weight_receiver import WeightPlaneReceiver
        from prime_rl_tpu.transport.weights import resolve_plane_id

        server.weight_receiver = WeightPlaneReceiver(
            config.weight_plane, resolve_plane_id(config.output_dir), engine,
            output_dir=config.output_dir,
        )
        server.weight_receiver.start()
        logger.info(f"weight plane receiver started (mode={config.weight_plane.mode})")
    return server


def main() -> None:
    configure_jax()
    config = parse_config(InferenceConfig)
    server = build_server(config)
    server.run(config.server.host, config.server.port)


if __name__ == "__main__":
    main()
