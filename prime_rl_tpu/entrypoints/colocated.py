"""Colocated learner+sampler process: one JAX runtime, one (set of) TPU
chip(s), serving and training time-sliced on the same mesh
(``python -m prime_rl_tpu.entrypoints.colocated @ rl.toml``).

This is the TPU-native weight plane (SURVEY.md §2.6): the per-step weight
"broadcast" is an in-process device-to-device cast into the live engine —
no NCCL, no RDMA, no filesystem roundtrip. The orchestrator (separate CPU
process) watches the policy version over ``/liveness``.
"""

from __future__ import annotations

import asyncio
import threading

from prime_rl_tpu.configs import RLConfig, parse_config
from prime_rl_tpu.utils.jax_env import configure_jax


def run_colocated(config: RLConfig) -> None:
    import jax
    import jax.numpy as jnp

    from prime_rl_tpu.models import get_family
    from prime_rl_tpu.models.base import get_spec
    from prime_rl_tpu.renderers.tokenizer import get_tokenizer
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine
    from prime_rl_tpu.sampler.server import InferenceServer
    from prime_rl_tpu.trainer.rl.broadcast import ColocatedBroadcast
    from prime_rl_tpu.trainer.rl.train import train
    from prime_rl_tpu.utils.logger import get_logger, setup_logger
    from prime_rl_tpu.utils.pathing import logs_dir

    tcfg, icfg = config.trainer, config.inference
    tcfg.output_dir = icfg.output_dir = config.output_dir
    setup_logger(tcfg.log.level, tcfg.log.json_logs,
                 logs_dir(config.output_dir) / "colocated.log")
    logger = get_logger()

    spec = get_spec(tcfg.model.name, num_layers=tcfg.model.debug.num_layers,
                    vocab_size=tcfg.model.debug.vocab_size)
    family = get_family(spec)
    # placeholder weights; the trainer's startup broadcast replaces them
    # before the orchestrator starts dispatching (it waits for version >= 0)
    placeholder = jax.eval_shape(lambda: family.init(spec, jax.random.key(0)))
    placeholder = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), placeholder)

    cache_cfg = CacheConfig(
        num_pages=icfg.kv.num_pages or 512,
        page_size=icfg.kv.page_size,
        max_slots=icfg.scheduler.max_batch_size,
        max_seq_len=icfg.max_model_len,
    )
    engine = Engine(placeholder, spec, cache_cfg, seed=icfg.seed,
                    collect_routed_experts=icfg.collect_routed_experts,
                    lookahead=icfg.scheduler.lookahead,
                    decode_block=icfg.scheduler.decode_block)
    if icfg.scheduler.warmup_requests > 0:
        engine.warmup(icfg.scheduler.warmup_requests)
    engine.pause()  # no serving until real weights land
    tokenizer = get_tokenizer(icfg.tokenizer.name or icfg.model.name)
    server = InferenceServer(engine, tcfg.model.name, tokenizer)

    def serve() -> None:
        async def _run():
            await server.start_async(icfg.server.host, icfg.server.port)
            await asyncio.Event().wait()

        asyncio.run(_run())

    threading.Thread(target=serve, daemon=True, name="inference-server").start()
    logger.info(
        f"colocated: serving on :{icfg.server.port}, engine pages="
        f"{cache_cfg.num_pages}x{cache_cfg.page_size}, training starts now"
    )
    train(tcfg, weight_sink=ColocatedBroadcast(engine))
    # bounded teardown: the server/engine daemon threads hold zmq/aiohttp
    # state that can abort at interpreter shutdown (reference:
    # orchestrator.py:95-97 uses the same os._exit pattern)
    import os

    os._exit(0)


def main() -> None:
    configure_jax()
    run_colocated(parse_config(RLConfig))


if __name__ == "__main__":
    main()
