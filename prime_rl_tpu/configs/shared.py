"""Shared config models: base class, model/tokenizer, mesh, monitor, logging.

API surface mirrors the reference config package
(reference: packages/prime-rl-configs/src/prime_rl/configs/shared.py,
trainer.py:150-320) but the parallelism block is a TPU mesh spec
(named axes over `jax.sharding.Mesh`) instead of torch ParallelDims.
"""

from __future__ import annotations

from typing import Annotated, Literal

from pydantic import BaseModel, BeforeValidator, ConfigDict, Field, field_validator, model_validator


class BaseConfig(BaseModel):
    model_config = ConfigDict(extra="forbid", validate_assignment=True, validate_default=True)


def default_tag(tag: str) -> BeforeValidator:
    """Inject ``type = tag`` into a partial dict so CLI overrides like
    ``--optimizer.lr=1e-5`` validate against a discriminated union without
    requiring the user to restate the default variant."""

    def inject(v: object) -> object:
        if isinstance(v, dict) and "type" not in v:
            return {**v, "type": tag}
        return v

    return BeforeValidator(inject)


class MeshConfig(BaseConfig):
    """Logical device mesh for the learner (and colocated sampler).

    Axes (in mesh order, outermost first):
      - ``replica``: pure data-parallel replication (HSDP outer dim).
      - ``fsdp``: parameter/optimizer sharding axis (ZeRO-3 analogue); batch is
        sharded over ``replica × fsdp`` jointly.
      - ``expert``: MoE expert parallelism (shard_map all_to_all dispatch).
      - ``context``: sequence/context parallelism (Ulysses all-to-all or ring).
      - ``tensor``: tensor parallelism (heads/ffn sharding; also sampler TP).

    -1 on exactly one axis means "absorb all remaining devices".
    """

    replica: int = 1
    fsdp: int = -1
    expert: int = 1
    context: int = 1
    tensor: int = 1

    def resolve(self, n_devices: int) -> dict[str, int]:
        sizes = {
            "replica": self.replica,
            "fsdp": self.fsdp,
            "expert": self.expert,
            "context": self.context,
            "tensor": self.tensor,
        }
        wild = [k for k, v in sizes.items() if v == -1]
        if len(wild) > 1:
            raise ValueError(f"at most one mesh axis may be -1, got {wild}")
        fixed = 1
        for k, v in sizes.items():
            if v != -1:
                fixed *= v
        if wild:
            if n_devices % fixed != 0:
                raise ValueError(f"{n_devices} devices not divisible by fixed axes product {fixed}")
            sizes[wild[0]] = n_devices // fixed
        total = 1
        for v in sizes.values():
            total *= v
        if total != n_devices:
            raise ValueError(f"mesh {sizes} covers {total} devices, have {n_devices}")
        return sizes


class AttentionConfig(BaseConfig):
    """Attention kernel selection.

    ``pallas`` is the TPU flash-attention kernel (ops/attention.py);
    ``xla`` is the reference einsum path (works on CPU, used in tests).
    ``auto`` picks pallas on TPU, xla elsewhere.
    """

    impl: Literal["auto", "pallas", "xla"] = "auto"
    # measured on v5e (64k sweep): block_q 1024 is ~+10-13% over 512 at both
    # 16k and 64k; 2048 spills VMEM in the backward. The backward internally
    # caps block_kv at 512 (2x working set).
    block_q: int = 1024
    block_kv: int = 1024  # larger kv blocks stream better from HBM on TPU


class ActivationCheckpointConfig(BaseConfig):
    """Rematerialization policy (reference: trainer.py apply_ac / full|selective).

    ``mode`` also accepts the stride form ``"save_attn/K"`` /
    ``"offload_attn/K"``: the policy applies to every K-th layer and the
    rest run full remat — the intermediate memory/recompute points between
    full remat and save_attn (the 64k lever when plain save_attn OOMs;
    reference analogue: act_offloading.py partial offload)."""

    mode: str = "full"
    # For selective: remat everything except these checkpointed op classes.
    save_dots: bool = True

    @field_validator("mode")
    @classmethod
    def _check_mode(cls, v: str) -> str:
        base, _, k = v.partition("/")
        allowed = {"none", "full", "save_attn", "offload_attn",
                   "offload_dots", "selective"}
        if base not in allowed:
            raise ValueError(f"ac.mode {v!r}: base must be one of {sorted(allowed)}")
        if k and (base not in ("save_attn", "offload_attn")
                  or not k.isdigit() or int(k) < 1):
            raise ValueError(
                f"ac.mode {v!r}: stride form is save_attn/K or offload_attn/K "
                "with integer K >= 1")
        return v


class LoRAConfig(BaseConfig):
    rank: int = 16
    alpha: float = 32.0
    dropout: float = 0.0
    target_modules: list[str] = Field(
        default_factory=lambda: ["q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"]
    )
    # MoE specs: apply gate/up/down targets PER EXPERT (adapter stacks gain a
    # leading [E] axis; ops/moe.moe_mlp runs two extra ragged_dots). Off by
    # default — generic MLP names on a MoE spec are skipped, attention-only.
    experts: bool = False


class DebugModelConfig(BaseConfig):
    """Tiny-model debug knobs (reference: model.py:656-663 layer truncation)."""

    num_layers: int | None = None
    # Truncate the vocab (and LM head) for offline byte-tokenizer runs: a
    # random-init 151k-vocab model sampled through the 260-id ByteTokenizer
    # decodes to garbage with probability ~1 (every token id > 255), so
    # reward-based smoke envs see identically-zero reward and learn nothing.
    # Must be >= 260 (byte vocab + specials); eos/pad remap to the byte ids
    # when the family's own ids fall outside the truncated range.
    vocab_size: int | None = None
    random_init: bool = False


class ModelConfig(BaseConfig):
    """Which model to train/serve and how to map it onto the mesh."""

    name: str = "Qwen/Qwen3-0.6B"
    attn: AttentionConfig = AttentionConfig()
    ac: ActivationCheckpointConfig = ActivationCheckpointConfig()
    lora: LoRAConfig | None = None
    debug: DebugModelConfig = DebugModelConfig()
    # Parameter/compute dtypes. Params live in float32 master copies inside the
    # optimizer; forward/backward run in bfloat16 on the MXU.
    compute_dtype: Literal["bfloat16", "float32"] = "bfloat16"
    param_dtype: Literal["bfloat16", "float32"] = "float32"
    # Gradient accumulation dtype. "bfloat16" differentiates against a
    # pre-cast bf16 param tree and accumulates in bf16 — halves both the
    # per-micro-batch grad tree and the accumulator (the long-context HBM
    # lever; ~= torch FSDP bf16 reduce numerics). f32 masters still drive
    # the optimizer update.
    grad_accum_dtype: Literal["float32", "bfloat16"] = "float32"
    # int8-COMPUTE training GEMMs (ops/int8_linear.py; VERDICT r4 missing
    # #2): MLP projections run as dynamic-quant int8 x int8 -> int32 on the
    # MXU (2x bf16 rate on v5e), bf16 STE backward. Off by default — the
    # A/B trade (Amdahl on non-MLP FLOPs, quant overhead, ~0.4%/dot error)
    # is documented in ops/int8_linear.py. qwen3-family dense models only.
    quantized_compute: Literal["int8"] | None = None
    # GatedDeltaNet chunked-scan matmul precision (ops/gated_delta.py):
    # "bfloat16" runs the delta-rule dots at full MXU rate with f32
    # accumulation; "highest" is exact-parity mode
    gdn_mxu_precision: Literal["highest", "bfloat16"] = "highest"

    # Context parallel style (reference: docs/scaling.md:106-118)
    cp_style: Literal["ulysses", "ring"] = "ulysses"
    # Chunk size for the vocab-chunked fused logprob/entropy LM head
    # (reference: models/layers/lm_head.py). 0 disables chunking.
    lm_head_chunk_size: int = 1024
    seq_len: int = 4096
    # MoE switch-style load-balance auxiliary loss coefficient (0 = monitor
    # only; reference: models/layers/moe.py load_balance_coeff)
    moe_aux_coef: float = 0.0
    # freeze parameters whose path matches any of these regexes (grads
    # zeroed; reference: trainer/model.py freeze helpers)
    freeze: list[str] = Field(default_factory=list)


class TokenizerConfig(BaseConfig):
    name: str | None = None  # defaults to model name
    trust_remote_code: bool = False


class FileMonitorConfig(BaseConfig):
    type: Literal["file"] = "file"
    path: str | None = None  # default: <output_dir>/metrics.jsonl


class WandbMonitorConfig(BaseConfig):
    type: Literal["wandb"] = "wandb"
    project: str = "prime-rl-tpu"
    name: str | None = None
    group: str | None = None
    offline: bool = False


MonitorConfig = Annotated[
    FileMonitorConfig | WandbMonitorConfig,
    Field(discriminator="type"),
    default_tag("file"),
]


class LogConfig(BaseConfig):
    level: Literal["debug", "info", "warning", "error"] = "info"
    json_logs: bool = False


class MetricsServerConfig(BaseConfig):
    enable: bool = False
    host: str = "0.0.0.0"
    port: int = 9100


class CheckpointConfig(BaseConfig):
    """Sharded train-state checkpoints (orbax) + retention
    (reference: trainer/ckpt.py:160-320)."""

    interval: int = 50
    keep_last: int | None = 2
    keep_interval: int | None = None
    resume_step: int | None = None  # -1 = latest


class WeightCheckpointConfig(BaseConfig):
    """HF-compatible safetensors snapshots for serving
    (reference: trainer/ckpt.py:322-517)."""

    interval: int = 100
    keep_last: int | None = 1
    save_format: Literal["safetensors"] = "safetensors"


class ConstantSchedulerConfig(BaseConfig):
    type: Literal["constant"] = "constant"
    warmup_steps: int = 0


class LinearSchedulerConfig(BaseConfig):
    type: Literal["linear"] = "linear"
    warmup_steps: int = 0
    decay_steps: int = 1000
    min_lr_ratio: float = 0.0


class CosineSchedulerConfig(BaseConfig):
    type: Literal["cosine"] = "cosine"
    warmup_steps: int = 0
    decay_steps: int = 1000
    min_lr_ratio: float = 0.1


SchedulerConfig = Annotated[
    ConstantSchedulerConfig | LinearSchedulerConfig | CosineSchedulerConfig,
    Field(discriminator="type"),
    default_tag("constant"),
]


class AdamWConfig(BaseConfig):
    type: Literal["adamw"] = "adamw"
    lr: float = 1e-6
    weight_decay: float = 0.01
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8


class SGDConfig(BaseConfig):
    type: Literal["sgd"] = "sgd"
    lr: float = 1e-6
    momentum: float = 0.0
    nesterov: bool = False
    weight_decay: float = 0.0


class MuonConfig(BaseConfig):
    type: Literal["muon"] = "muon"
    lr: float = 2e-2
    weight_decay: float = 0.01
    momentum: float = 0.95
    adamw_lr: float = 1e-6  # for non-matrix params


class SignSGDConfig(BaseConfig):
    type: Literal["sign_sgd"] = "sign_sgd"
    lr: float = 1e-6
    weight_decay: float = 0.0


class AdamW8bitConfig(BaseConfig):
    """AdamW with blockwise-int8 moments: 8x less optimizer-state HBM
    (~1 byte/param/moment). State HBM freed this way can buy back
    rematerialization (ac.mode=save_attn) at long context. Optionally pairs
    with bf16 master weights + stochastic rounding (master_dtype) for
    another 2x on the params."""

    type: Literal["adamw_8bit"] = "adamw_8bit"
    lr: float = 1e-6
    weight_decay: float = 0.01
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    block: int = 2048  # params per quantization block
    master_dtype: Literal["float32", "bfloat16"] = "float32"


class AdafactorMomConfig(BaseConfig):
    """Adafactor with bf16 momentum (Adam-like recipe: no relative step,
    no param scaling): the second moment is rank-1 factored — O(N+M) instead
    of O(NM) — and the first moment is half-width. The biggest state shrink
    available; quality within noise of Adam for LLM training at these
    scales."""

    type: Literal["adafactor_mom"] = "adafactor_mom"
    lr: float = 1e-6
    weight_decay: float = 0.0
    momentum: float = 0.9
    decay_rate: float = 0.8  # adafactor's step-dependent 2nd-moment decay
    clipping_threshold: float = 1.0
    master_dtype: Literal["float32", "bfloat16"] = "float32"


OptimizerConfig = Annotated[
    AdamWConfig | SGDConfig | MuonConfig | SignSGDConfig
    | AdamW8bitConfig | AdafactorMomConfig,
    Field(discriminator="type"),
    default_tag("adamw"),
]
