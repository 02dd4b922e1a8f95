"""Model registry: family -> (init, forward, conversion).

Families mirror the reference inventory (SURVEY.md §2.2): qwen3 (dense),
llama (qwen3 block minus qk_norm), qwen3_moe. Further families are added
per-module here.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Callable

import jax

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import (
    BUILTIN_SPECS,
    ModelSpec,
    Params,
    count_params,
    debug_spec,
    get_spec,
    param_shardings,
)


class Family:
    def __init__(self, init, forward, from_hf, to_hf, get_lm_head):
        self.init = init
        self.forward = forward
        self.from_hf = from_hf
        self.to_hf = to_hf
        self.get_lm_head = get_lm_head


FAMILIES: dict[str, Family] = {
    "qwen3": Family(
        qwen3.init_params, qwen3.forward, qwen3.params_from_hf_state_dict,
        qwen3.params_to_hf_state_dict, qwen3.get_lm_head,
    ),
    # llama shares the qwen3 block with qk_norm=False via the spec flag
    "llama": Family(
        qwen3.init_params, qwen3.forward, qwen3.params_from_hf_state_dict,
        qwen3.params_to_hf_state_dict, qwen3.get_lm_head,
    ),
}


def register_family(name: str, family: Family) -> None:
    FAMILIES[name] = family


def get_family(spec: ModelSpec) -> Family:
    if spec.family not in FAMILIES:
        # lazy-load optional families
        if spec.family == "qwen3_moe":
            from prime_rl_tpu.models import qwen3_moe  # noqa: F401
        if spec.family == "gpt_oss":
            from prime_rl_tpu.models import gpt_oss  # noqa: F401
        if spec.family == "glm4_moe":
            from prime_rl_tpu.models import glm4_moe  # noqa: F401
        if spec.family == "nemotron_h":
            from prime_rl_tpu.models import nemotron_h  # noqa: F401
        if spec.family in ("qwen3_vl", "qwen3_vl_moe"):
            from prime_rl_tpu.models import qwen3_vl  # noqa: F401
        if spec.family in ("deepseek_v3", "glm_moe_dsa"):
            from prime_rl_tpu.models import mla_moe  # noqa: F401
        if spec.family in ("minimax_m2", "afmoe", "laguna"):
            from prime_rl_tpu.models import gated_moe  # noqa: F401
        if spec.family in ("qwen3_next", "qwen3_next_vl"):
            from prime_rl_tpu.models import qwen3_next  # noqa: F401
        if spec.family not in FAMILIES:
            raise ValueError(f"unknown model family {spec.family!r}")
    return FAMILIES[spec.family]
