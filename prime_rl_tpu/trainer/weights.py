"""HF-format weight snapshots for serving + interchange.

Parity with the reference's WeightCheckpointManager (reference:
trainer/ckpt.py:322-517, trainer/weights.py): per-step
``weights/step_{N}/model.safetensors`` + config.json + STABLE marker, with
``keep_last`` retention; also the filesystem weight-broadcast payload the
sampler reloads from. Safetensors is written via its numpy backend — no
torch dependency on the hot path.
"""

from __future__ import annotations

import json
import shutil
from dataclasses import asdict
from pathlib import Path

import jax
import numpy as np

from prime_rl_tpu.configs.shared import WeightCheckpointConfig
from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.utils import pathing


def spec_to_hf_config(spec: ModelSpec) -> dict:
    """Minimal HF config.json so external tools recognize the snapshot."""
    arch = {
        "qwen3": "Qwen3ForCausalLM",
        "qwen3_moe": "Qwen3MoeForCausalLM",
        "llama": "LlamaForCausalLM",
    }.get(spec.family, "Qwen3ForCausalLM")
    cfg = {
        "architectures": [arch],
        "vocab_size": spec.vocab_size,
        "hidden_size": spec.hidden_size,
        "num_hidden_layers": spec.num_layers,
        "num_attention_heads": spec.num_heads,
        "num_key_value_heads": spec.num_kv_heads,
        "head_dim": spec.head_dim,
        "intermediate_size": spec.intermediate_size,
        "rope_theta": spec.rope_theta,
        "rms_norm_eps": spec.rms_eps,
        "tie_word_embeddings": spec.tie_embeddings,
        "max_position_embeddings": spec.max_position_embeddings,
        "eos_token_id": spec.eos_token_id,
        "pad_token_id": spec.pad_token_id,
        "torch_dtype": "bfloat16",
    }
    if spec.is_moe:
        cfg.update(
            num_experts=spec.num_experts,
            num_experts_per_tok=spec.num_experts_per_tok,
            moe_intermediate_size=spec.moe_intermediate_size,
            norm_topk_prob=spec.norm_topk_prob,
        )
    return cfg


def save_hf_weights(params: Params, spec: ModelSpec, path: str | Path) -> Path:
    """Gather + convert + write ``model.safetensors`` and ``config.json``.

    Params are fetched shard-by-shard to host (orbax-free path — snapshots
    must be readable by any HF-compatible loader)."""
    from safetensors.numpy import save_file

    from prime_rl_tpu.models import get_family

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_params = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), params)
    state = get_family(spec).to_hf(host_params, spec)
    # bf16 on disk (serving dtype); safetensors numpy backend handles ml_dtypes
    import ml_dtypes

    # ascontiguousarray matters: astype(order='K') keeps transposed views
    # non-contiguous and safetensors writes the raw buffer
    state = {k: np.ascontiguousarray(v.astype(ml_dtypes.bfloat16)) for k, v in state.items()}
    save_file(state, path / "model.safetensors")
    (path / "config.json").write_text(json.dumps(spec_to_hf_config(spec), indent=2))
    pathing.mark_stable(path)
    return path


def load_hf_weights(path: str | Path, spec: ModelSpec) -> Params:
    """Read an HF snapshot dir (one or more .safetensors shards) into our
    stacked pytree (float32 masters)."""
    from safetensors.numpy import load_file

    from prime_rl_tpu.models import get_family

    path = Path(path)
    state: dict[str, np.ndarray] = {}
    for f in sorted(path.glob("*.safetensors")):
        state.update(load_file(f))
    state = {k: np.asarray(v, dtype=np.float32) for k, v in state.items()}
    return get_family(spec).from_hf(state, spec, dtype=np.float32)


class WeightCheckpointManager:
    """Serving snapshots under ``weights/step_{N}`` with retention."""

    def __init__(self, output_dir: str | Path, config: WeightCheckpointConfig, spec: ModelSpec):
        self.output_dir = Path(output_dir)
        self.config = config
        self.spec = spec

    def save(self, params: Params, step: int) -> Path:
        path = save_hf_weights(params, self.spec, pathing.weights_dir(self.output_dir, step))
        self._retain()
        return path

    def _retain(self) -> None:
        keep = self.config.keep_last
        if keep is None:
            return
        steps = pathing.list_step_dirs(self.output_dir / "weights", stable_only=False)
        for s in steps[:-keep] if keep else steps:
            shutil.rmtree(pathing.weights_dir(self.output_dir, s), ignore_errors=True)
