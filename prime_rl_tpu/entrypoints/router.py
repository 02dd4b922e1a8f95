"""Standalone inference router: ``python -m prime_rl_tpu.entrypoints.router
--port 8000 --backends http://h1:8100 http://h2:8100`` — the single
client-facing URL fronting all engine replicas (reference:
docs/inference.md Router section; vllm-router / llm-d EPP role)."""

from __future__ import annotations

from prime_rl_tpu.configs import RouterConfig, parse_config


def main() -> None:
    config = parse_config(RouterConfig)
    from prime_rl_tpu.sampler.router import Router
    from prime_rl_tpu.utils.logger import get_logger, setup_logger

    setup_logger(config.log.level, config.log.json_logs)
    backends = list(config.backends)
    if config.discovery_file:
        from pathlib import Path

        lines = Path(config.discovery_file).read_text().splitlines()
        backends += [ln.strip() for ln in lines if ln.strip()]
    if not backends:
        raise SystemExit("router: no backends configured")
    get_logger().info(
        f"router up on :{config.port} policy={config.policy} backends={backends}")
    Router(backends, policy=config.policy,
           health_interval=config.health_interval,
           prefill_backends=config.prefill_backends,
           pd_threshold=config.pd_threshold).run(config.host, config.port)


if __name__ == "__main__":
    main()
