"""Router entrypoint config (reference: docs/inference.md [inference.router])."""

from __future__ import annotations

from typing import Literal

from pydantic import Field

from prime_rl_tpu.configs.shared import BaseConfig, LogConfig


class RouterConfig(BaseConfig):
    output_dir: str = "outputs"
    host: str = "0.0.0.0"
    port: int = 8000
    # engine replica base URLs; may also come from a discovery file (one per
    # line — the elastic pool's file-discovery format)
    backends: list[str] = Field(default_factory=list)
    discovery_file: str | None = None
    # consistent_hash: X-Session-ID / cache_salt affinity (prefix-cache
    # reuse); round_robin; least_loaded (active-request-scorer analogue)
    policy: Literal["consistent_hash", "round_robin", "least_loaded"] = "consistent_hash"
    health_interval: float = 2.0
    # P/D disaggregation: prefill-role engine URLs; prompts >= pd_threshold
    # tokens prefill there and inject into a decode backend (reference:
    # docs/inference.md optimized P/D + llm-d non_cached_tokens)
    prefill_backends: list[str] = Field(default_factory=list)
    pd_threshold: int = 16
    log: LogConfig = LogConfig()
