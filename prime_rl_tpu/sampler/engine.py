"""Continuous-batching sampling engine — the first-party replacement for the
reference's vLLM inference layer (reference: SURVEY.md §2.4 "vLLM" row).

Architecture (TPU-first, latency-pipelined):
- ONE decode program for all slots, jitted once. Decode state (last tokens,
  lengths, active mask, per-slot sampling params, PRNG key) lives ON DEVICE
  and is threaded functionally between steps — the host never syncs inside
  the decode loop. Steps are dispatched ahead (async) and their outputs
  drained with a small LOOKAHEAD, so per-step host↔device latency is fully
  hidden (a synchronous loop pays a device round-trip per token; this design
  pays one per LOOKAHEAD tokens and pipelines the rest).
- Bucketed prefill writes K/V pages and seeds the slot's device state in
  the same dispatch stream (donation keeps ordering).
- Slot release is deferred until every in-flight step that referenced the
  slot has drained, so page reuse can never race a pending write.
- Weight update = swapping the params pytree between dispatches
  (pause/resume protocol, reference: inference/vllm/server.py:70-147);
  in-flight requests keep their KV cache, matching the reference's in-place
  update semantics.
"""

from __future__ import annotations

import functools
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.sampler import model as smodel
from prime_rl_tpu.sampler.cache import CacheConfig, KVPool, RecurrentPool, SlotTable
from prime_rl_tpu.sampler.sampling import sample_tokens
from prime_rl_tpu.utils.logger import get_logger


@dataclass
class SamplingParams:
    max_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    stop_token_ids: list[int] = field(default_factory=list)
    logprobs: bool = True
    prompt_logprobs: bool = False
    seed: int | None = None
    ignore_eos: bool = False  # benchmarking: always generate max_tokens
    # extra prefix-cache isolation domain (the engine already flushes the
    # cache on every weight update; reference salts by policy version at
    # dispatcher.py:437-441)
    cache_salt: str | None = None
    # serve base + this loaded adapter (multi-LoRA bank; None = base model)
    adapter: str | None = None
    # P/D disaggregation: prefill-role engines return the request's KV pages
    # + first sampled token instead of decoding (reference: optimized P/D
    # deployment, docs/inference.md)
    extract_kv: bool = False
    # constrained (guided) decoding: a JSON schema or a regex compiled to a
    # byte-level DFA whose token mask is applied IN the jitted decode block
    # (sampler/constrain.py; reference: vLLM guided decoding the reference
    # leans on via inference/patches.py)
    json_schema: dict | None = None
    regex: str | None = None

    @property
    def constrained(self) -> bool:
        return self.json_schema is not None or self.regex is not None


@dataclass
class GenerationResult:
    token_ids: list[int]  # completion tokens
    logprobs: list[float]
    finish_reason: str  # "stop" | "length" | "aborted"
    prompt_len: int
    prompt_logprobs: list[float] | None = None
    policy_version: int = -1
    # router replay (collect_routed_experts): [n_gen, NL_moe, K] int32 expert
    # ids per generated token; the final token's row is -1 (its forward never
    # ran). None when collection is off / nothing was recorded.
    routed_experts: "np.ndarray | None" = None
    # P/D prefill extraction: {"k": [NL, NKV, n_pages, PS, HD] np, "v": same,
    # "pos_delta": int} — the decode engine injects these (inject below)
    kv: dict | None = None


@dataclass
class _Request:
    prompt: list[int]
    params: SamplingParams
    future: Future
    # streaming: called from the engine thread per sampled token
    on_token: "callable | None" = None
    request_id: str | None = None
    aborted: bool = False
    # VLM inputs (host numpy): {"pixel_values": [P, patch_dim] f32,
    # "image_grid_thw": [n, 3]} — HF-processor layout
    mm: dict | None = None
    # P/D decode-side injection: {"k", "v", "first_token", "first_logprob",
    # "pos_delta"} — KV produced by a prefill-role engine
    inject: dict | None = None


@dataclass
class _Active:
    req: _Request
    slot: int
    generated: list[int] = field(default_factory=list)
    logprobs: list[float] = field(default_factory=list)
    # router-replay recording: routed[i] = expert ids [NL_moe, K] of
    # generated[i] (the last token's routing is never computed - padded -1)
    routed: list = field(default_factory=list)
    prompt_logprobs_handle: jax.Array | None = None
    first_token_handle: tuple | None = None  # (token_dev, logprob_dev)
    kv: dict | None = None  # P/D extraction payload, attached at finish
    done: bool = False


@dataclass
class _StepOutput:
    """One dispatched decode program (k on-device steps) awaiting drain."""

    seq: int
    packed: jax.Array  # [K, S, 2] f32 device: tokens (exact) + logprobs
    slots: list[int]  # slots active at dispatch time
    routed: "jax.Array | None" = None  # [K, S, NL_moe, topk] routing of INPUT tokens
    k: int = 1  # on-device decode steps in this program


def _bucket(n: int, buckets: list[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds max bucket {buckets[-1]}")


class Engine:
    """Single-host sampling engine over one (possibly sharded) params pytree."""

    LOOKAHEAD = 8  # in-flight decode steps per batched drain

    def __init__(
        self,
        params: Params,
        spec: ModelSpec,
        cache_config: CacheConfig | None = None,
        *,
        compute_dtype=jnp.bfloat16,
        prefill_attn_impl: str = "auto",
        decode_attn_impl: str = "auto",
        seed: int = 0,
        quantize: str | None = None,
        lora_config=None,  # ServingLoRAConfig: enables the multi-LoRA bank
        collect_routed_experts: bool = False,  # record decode-time MoE routing
        mesh=None,  # TP serving (reference: vLLM tensor_parallel_size):
        # params/pools shard over the mesh's "tensor" axis; decode attention
        # runs head-local under shard_map, the o/down psum rides GSPMD
        lookahead: int | None = None,  # in-flight decode TOKENS per drain
        decode_block: int = 8,  # on-device decode steps per dispatched program
        donate_startup_params: bool = False,  # caller hands over `params`:
        # halves transient HBM during setup (required for 4B-class serving
        # on 16 GB); the caller must never touch the arrays again
        token_bytes: "list[bytes] | None" = None,  # vocab id -> raw bytes,
        # required for constrained decoding (the server wires it from the
        # tokenizer via constrain.token_bytes_from_tokenizer)
    ):
        self.spec = spec
        if lookahead:
            self.LOOKAHEAD = int(lookahead)
        self.decode_block = max(1, int(decode_block))
        self.mesh = mesh
        self._tp = mesh.shape.get("tensor", 1) if mesh is not None else 1
        self.compute_dtype = compute_dtype
        self._collect_routed = bool(collect_routed_experts and spec.is_moe)
        self.quantize = quantize
        self.lora_config = lora_config
        self._lora_bank: dict[str, jax.Array] | None = None
        self.adapters: dict[str, int] = {}
        self._free_adapter_rows: list[int] = []
        if lora_config is not None:
            self._init_lora_bank()
        self.params = self._prepare_params(params, donate=donate_startup_params)
        self.config = cache_config or CacheConfig()
        pool = KVPool(spec, self.config, dtype=compute_dtype)
        self.k_pool, self.v_pool = pool.k, pool.v
        # hybrid (GDN/Mamba) models carry per-slot recurrent state for their
        # linear-attention layers. Attention-layer KV still pages normally,
        # so chunked prefill works (recurrent layers thread state between
        # chunks), prefix caching works via host-side recurrent-state
        # checkpoints at page boundaries (_state_tier), and P/D works by
        # shipping the recurrent rows alongside the KV pages — vLLM disables
        # all of these for hybrid models. MLA chunking over latent pages is
        # exact — DSA included (its indexer keys page alongside and each
        # chunk query re-runs the top-k selection), so deepseek/GLM-DSA keep
        # prefix caching + chunked prefill + P/D (latent pages on the wire)
        # as well.
        self.is_hybrid = bool(spec.gdn_pattern or spec.layer_pattern)
        from prime_rl_tpu.sampler.cache import layer_kinds

        if not any(kd in ("A", "*") for kd in layer_kinds(spec)):
            raise ValueError(
                f"model family {spec.family!r} has no attention layers "
                "(pure-recurrent patterns are not servable: the engine needs "
                "at least one paged-KV layer to size pages)")
        rpool = RecurrentPool(spec, self.config, dtype=compute_dtype)
        self.r_conv, self.r_state = rpool.conv, rpool.state
        if self.mesh is not None:
            from prime_rl_tpu.sampler.sharding import replicate, shard_pools

            self.k_pool = shard_pools(self.k_pool, self.mesh, self._tp)
            self.v_pool = shard_pools(self.v_pool, self.mesh, self._tp)
            self.r_conv = replicate(self.r_conv, self.mesh)
            self.r_state = replicate(self.r_state, self.mesh)
        prefix_ok = self.config.enable_prefix_cache and (
            not self.is_hybrid or self.config.state_cache_mb > 0)
        self.slots = SlotTable(self.config, enable_prefix_cache=prefix_ok)
        # hybrid prefix cache: page-chain hash -> (boundary recurrent-state
        # snapshot, host numpy per layer), LRU-bounded by state_cache_mb
        self._state_tier = None
        self._state_tier_bytes = 0
        if self.is_hybrid and prefix_ok:
            from collections import OrderedDict

            self._state_tier = OrderedDict()
        # host-offload KV tier: hash -> (k [NL,NKV,1,PS,HD], v) host arrays
        self._host_tier: "dict[int, tuple] | None" = None
        self._host_tier_bytes = 0
        if (self.config.host_cache_mb > 0 and prefix_ok
                and spec.kv_lora_rank == 0 and not self.is_hybrid):
            from collections import OrderedDict

            self._host_tier = OrderedDict()
            self.slots.evict_sink = self._spill_page
        self.pending: deque[_Request] = deque()
        self.active: dict[int, _Active] = {}
        self.paused = False
        self.policy_version = -1
        self._lock = threading.Lock()
        # serializes the engine loop's step() against cross-thread mutators
        # (update_params from a colocated trainer / weight receiver,
        # load_adapter from the server): a dispatch donates the device state
        # arrays, and a concurrent drain on another thread can read a
        # just-donated buffer ("Buffer has been deleted or donated")
        self._step_lock = threading.Lock()
        self._by_id: dict[str, _Request] = {}
        self._hol_strikes = 0
        self.stats = {
            "prefill_tokens_computed": 0,
            "prefill_tokens_cached": 0,
            "requests_admitted": 0,
            "requests_aborted": 0,
            "requests_rejected": 0,
        }
        self._prefill_attn_impl = prefill_attn_impl
        self._decode_attn_impl = decode_attn_impl
        ps = self.config.page_size
        self.buckets = [b for b in (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
                        if b <= self.config.max_seq_len and b % ps == 0]
        if not self.buckets or self.buckets[-1] < self.config.max_seq_len:
            self.buckets.append(self.config.max_seq_len)

        # device-resident decode state
        s = self.config.max_slots
        self._d_tokens = jnp.zeros((s,), jnp.int32)
        self._d_lengths = jnp.zeros((s,), jnp.int32)
        self._d_active = jnp.zeros((s,), jnp.bool_)
        self._d_temp = jnp.ones((s,), jnp.float32)
        self._d_topk = jnp.full((s,), -1, jnp.int32)
        self._d_topp = jnp.ones((s,), jnp.float32)
        self._d_adapter = jnp.zeros((s,), jnp.int32)
        # VLM: per-slot rope-position offset (mRoPE decode continuation)
        self._d_pos_delta = jnp.zeros((s,), jnp.int32)
        # in-program stopping state (multi-token decode)
        self._d_limit = jnp.zeros((s,), jnp.int32)
        self._d_stop = jnp.full((s, self.MAX_STOP), -1, jnp.int32)
        self._vision_fns: dict[int, any] = {}
        self._mm_buckets = [256, 512, 1024, 2048, 4096, 8192, 16384, 32768]
        self._d_table = jnp.asarray(self.slots.page_table)
        self._table_dirty = False
        self._d_key = jax.random.key(seed)

        self._inflight: deque[_StepOutput] = deque()
        self._dispatch_seq = 0
        self._deferred_release: list[tuple[int, int]] = []  # (slot, seq at finish)
        self._shadow_lengths = np.zeros((s,), np.int64)  # host mirror (exact)
        self._host_limit = np.zeros((s,), np.int64)  # device limit mirror

        # constrained decoding: DFA bank (fixed shapes so the constrained
        # decode program compiles once) + per-slot constraint assignment
        self.token_bytes = token_bytes
        self.CONS_BANK = 4  # concurrent distinct constraints
        self._cons_cache: dict[str, any] = {}  # key -> CompiledConstraint
        self._cons_bank_keys: list[str | None] = [None] * self.CONS_BANK
        self._cons_bank_refs = [0] * self.CONS_BANK
        self._h_cons_idx = np.full((s,), -1, np.int32)  # host mirror
        self._d_cons_idx = jnp.full((s,), -1, jnp.int32)
        self._d_dfa = jnp.zeros((s,), jnp.int32)
        self._d_cons_trans = None  # [C, NS, 256] int32, lazy
        self._d_cons_accept = None  # [C, NS] bool
        self._tok_chars = None  # [V, Lm] uint8 device, lazy
        self._tok_lens = None  # [V] int32 device
        self._tok_chars_np = None
        self._tok_lens_np = None
        self._cons_active = 0  # live constrained slots (fast-path gate)
        self._set_cons_fn = jax.jit(
            lambda ci, df, slot, c: (ci.at[slot].set(c), df.at[slot].set(0)),
            donate_argnums=(0, 1),
        )

        self._decode_fns: dict[int, any] = {}
        self._set_slot_fn = self._build_set_slot()
        self._set_slot_batch_fn = None  # lazy (batched prefill admissions)
        self._deactivate_fn = jax.jit(
            lambda active, slot: active.at[slot].set(False), donate_argnums=(0,)
        )
        self._prefill_fns: dict[tuple[int, bool], any] = {}
        self._chunk_fns: dict[int, any] = {}
        self._sample_hidden_fn = None

    # -- jitted programs ----------------------------------------------------

    def _build_decode(self, k_steps: int = 1, constrained: bool = False):
        """Jitted multi-token decode: ``k_steps`` full decode+sample rounds in
        ONE dispatched program via ``lax.scan``, with in-program EOS / stop-id
        / length masking per slot. The host pays one op-dispatch (and, behind
        a tunnel, one round-trip share) per k tokens instead of per token —
        decode is dispatch-bound at serving shapes, so this closes the
        device-rate vs e2e gap (VERDICT r3 Weak #3 / next-round #1; the
        reference gets the equivalent from vLLM's continuous on-GPU loop,
        inference/vllm/serving_tokens.py:1-62). A slot that hits a stop
        condition is deactivated INSIDE the program, so later scan iterations
        — and later already-dispatched programs, which carry the active mask
        forward — skip it without a host round-trip."""
        spec, dtype, impl = self.spec, self.compute_dtype, self._decode_attn_impl
        lora_on = self._lora_bank is not None
        collect = self._collect_routed
        mesh = self.mesh
        eos_id = int(spec.eos_token_id)

        def _dfa_advance(cons_trans, cidx, st, chars, lens):
            """Walk each slot's state through its token's bytes (vectorized
            over slots; Lm unrolled gathers)."""
            for i in range(chars.shape[-1]):
                live = (i < lens) & (st >= 0)
                nxt = cons_trans[cidx, jnp.maximum(st, 0), chars[..., i]]
                st = jnp.where(live, nxt, st)
            return st

        # NOTE: the k steps are UNROLLED straight-line inside the jit, not a
        # lax.scan — a loop carry forces XLA to materialize the KV pools as
        # loop state and the per-layer Pallas aliases degrade to full-pool
        # copies every iteration (measured 4x slower per token). Straight-line
        # chaining keeps every append in place; compile time grows with k
        # (one-time, and k is limited to two values by _pick_block).
        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5, 10, 13, 14))
        def decode_fn(params, k_pool, v_pool, tokens, lengths, active, page_table,
                      temp, top_k, top_p, key, adapter, pos_delta, r_conv, r_state,
                      limit, stop_ids, cons_trans=None, cons_accept=None,
                      cons_idx=None, dfa_state=None, tok_chars=None, tok_lens=None):
            toks_rows, lps_rows, routed_rows = [], [], []
            for _ in range(k_steps):
                out = smodel.decode(
                    params, spec, k_pool, v_pool, tokens, lengths, page_table,
                    compute_dtype=dtype, attn_impl=impl,
                    adapter_idx=adapter if lora_on else None,
                    pos_delta=pos_delta, collect_routing=collect,
                    r_conv=r_conv, r_state=r_state, mesh=mesh,
                )
                if collect:
                    k_pool, v_pool, logits, routed, r_conv, r_state = out
                else:
                    (k_pool, v_pool, logits, r_conv, r_state), routed = out, None
                if constrained:
                    # invariant: dfa_state = state BEFORE consuming the
                    # input token `tokens` (admit seeds state 0 + the
                    # prefill-sampled first token). Advance by the input
                    # token, mask the NEXT token's logits from the new
                    # state, and carry the state forward — so the whole
                    # walk stays inside the multi-token decode block
                    # (sampler/constrain.py).
                    cidx = jnp.maximum(cons_idx, 0)
                    is_c = (cons_idx >= 0) & active
                    st = _dfa_advance(cons_trans, cidx, dfa_state,
                                      tok_chars[tokens], tok_lens[tokens])
                    st = jnp.where(is_c, st, dfa_state)
                    s_n, v_n = logits.shape
                    sv = jnp.broadcast_to(st[:, None], (s_n, v_n))
                    sv = _dfa_advance(
                        cons_trans, cidx[:, None], sv,
                        tok_chars[None, :, :], tok_lens[None, :])
                    allowed = (sv >= 0) & (tok_lens[None, :] <= tok_chars.shape[-1])
                    eos_ok = cons_accept[cidx, jnp.maximum(st, 0)]
                    allowed = allowed.at[:, eos_id].set(
                        eos_ok | ~allowed.any(axis=1))
                    logits = jnp.where(is_c[:, None] & ~allowed,
                                       jnp.float32(-1e9), logits)
                    dfa_state = st
                step_key, key = jax.random.split(key)
                out_tokens, out_logprobs = sample_tokens(logits, temp, top_k, top_p, step_key)
                # frozen slots keep their last token so their state is stable
                out_tokens = jnp.where(active, out_tokens, tokens)
                new_lengths = lengths + active.astype(jnp.int32)
                # in-program stopping: stop-token hit (row of -1-padded ids;
                # eos rides the row unless ignore_eos) or length budget spent
                hit_stop = (out_tokens[:, None] == stop_ids).any(axis=1)
                active = active & ~hit_stop & (new_lengths < limit)
                tokens, lengths = out_tokens, new_lengths
                toks_rows.append(out_tokens)
                lps_rows.append(out_logprobs)
                if collect:
                    routed_rows.append(routed)
            # pack tokens+logprobs into ONE output: each fetched array pays a
            # full host round-trip on remote runtimes (~25 ms on the tunnel),
            # so the drain wants exactly one small array per program. Tokens
            # ride as f32 (exact below 2^24 >> any vocab).
            packed = jnp.stack([
                jnp.stack(toks_rows).astype(jnp.float32),   # [K, S]
                jnp.stack(lps_rows).astype(jnp.float32),
            ], axis=-1)                                      # [K, S, 2]
            routed_k = jnp.stack(routed_rows) if collect else None
            return (k_pool, v_pool, tokens, lengths, active, key,
                    packed, routed_k, r_conv, r_state, dfa_state)

        return decode_fn

    def _decode_fn_for(self, k_steps: int, constrained: bool = False):
        fn = self._decode_fns.get((k_steps, constrained))
        if fn is None:
            fn = self._decode_fns[(k_steps, constrained)] = self._build_decode(
                k_steps, constrained)
        return fn

    # -- constrained decoding ------------------------------------------------

    def _ensure_token_tables(self) -> None:
        from prime_rl_tpu.sampler import constrain

        if self._tok_chars is not None:
            return
        if self.token_bytes is None:
            raise ValueError(
                "constrained decoding needs the vocab's token bytes — "
                "construct the Engine with token_bytes="
                "constrain.token_bytes_from_tokenizer(tokenizer)")
        tb = list(self.token_bytes)[: self.spec.vocab_size]
        tb += [b""] * (self.spec.vocab_size - len(tb))
        chars, lens = constrain.build_token_tables(tb)
        self._tok_chars_np, self._tok_lens_np = chars, lens
        self._tok_chars = jnp.asarray(chars)
        self._tok_lens = jnp.asarray(lens)

    def _cons_compile(self, sp: SamplingParams):
        from prime_rl_tpu.sampler import constrain

        key = ("schema:" + __import__("json").dumps(sp.json_schema, sort_keys=True)
               if sp.json_schema is not None else "regex:" + sp.regex)
        cc = self._cons_cache.get(key)
        if cc is None:
            cc = constrain.CompiledConstraint.from_params(sp.json_schema, sp.regex)
            self._cons_cache[key] = cc
            # LRU-bound: per-request dynamic schemas (agent frameworks embed
            # ids) would otherwise grow ~0.5 MB transition tables forever
            while len(self._cons_cache) > 64:
                old = next(iter(self._cons_cache))
                if old in self._cons_bank_keys:  # live in the bank: keep
                    self._cons_cache[old] = self._cons_cache.pop(old)
                    continue
                del self._cons_cache[old]
        else:
            self._cons_cache[key] = self._cons_cache.pop(key)  # refresh LRU
        return cc

    def _cons_assign(self, cc) -> int:
        """Bank row for this constraint (reusing an identical live row);
        raises when all rows hold OTHER live constraints."""
        from prime_rl_tpu.sampler import constrain

        if cc.key in self._cons_bank_keys:
            return self._cons_bank_keys.index(cc.key)
        for row in range(self.CONS_BANK):
            if self._cons_bank_refs[row] == 0:
                self._cons_bank_keys[row] = cc.key
                self._upload_cons_row(row, cc)
                return row
        raise RuntimeError(
            f"all {self.CONS_BANK} constraint bank rows are busy with "
            "distinct live constraints — retry when a request finishes")

    def _upload_cons_row(self, row: int, cc) -> None:
        from prime_rl_tpu.sampler import constrain

        ns = constrain.MAX_STATES
        if self._d_cons_trans is None:
            self._d_cons_trans = jnp.full(
                (self.CONS_BANK, ns, 256), -1, jnp.int32)
            self._d_cons_accept = jnp.zeros((self.CONS_BANK, ns), jnp.bool_)
        t = np.full((ns, 256), -1, np.int32)
        a = np.zeros((ns,), bool)
        t[: cc.dfa.num_states] = cc.dfa.trans
        a[: cc.dfa.num_states] = cc.dfa.accept
        self._d_cons_trans = self._d_cons_trans.at[row].set(jnp.asarray(t))
        self._d_cons_accept = self._d_cons_accept.at[row].set(jnp.asarray(a))

    def _set_cons(self, slot: int, cidx: int) -> None:
        """Assign/clear a slot's constraint row (device update only when the
        value changes — the unconstrained hot path never dispatches here)."""
        if self._h_cons_idx[slot] == cidx and cidx < 0:
            return
        self._h_cons_idx[slot] = cidx
        if self._d_cons_trans is None and cidx < 0:
            return  # constraints never used in this process
        self._d_cons_idx, self._d_dfa = self._set_cons_fn(
            self._d_cons_idx, self._d_dfa, jnp.int32(slot), jnp.int32(cidx))

    def _cons_release_slot(self, slot: int) -> None:
        cidx = int(self._h_cons_idx[slot])
        if cidx >= 0:
            self._cons_bank_refs[cidx] = max(0, self._cons_bank_refs[cidx] - 1)
            self._cons_active = max(0, self._cons_active - 1)
            # KEEP the host mirror >= 0: the DEVICE cons_idx still holds the
            # row, and the next admit's _set_cons(slot, -1) must actually
            # dispatch the clear — zeroing the mirror here made that call
            # early-return, so an unconstrained request reusing this slot
            # (while another constrained slot kept the masked program live)
            # inherited the dead DFA's mask. The inactive window in between
            # is safe: the in-jit mask gates on `cons_idx >= 0 AND active`.

    def _cons_prefill_bias(self, cc) -> jax.Array:
        """[V] f32 logits bias for the FIRST token (prefill samples it outside
        the decode block, so its mask is computed host-side from state 0)."""
        from prime_rl_tpu.sampler import constrain

        allowed = constrain.host_allowed_mask(
            cc.dfa, 0, self._tok_chars_np, self._tok_lens_np,
            self.spec.eos_token_id)
        return jnp.asarray(np.where(allowed, 0.0, -1e9).astype(np.float32))

    def _build_set_slot_batch(self):
        """Row-vector slot seeding for batched prefill: ONE dispatched
        program seeds every admitted slot's device state (the per-slot loop
        paid one dispatch EACH — at 8-row batches through a remote tunnel
        that was 8x the host latency per admission burst; VERDICT r4 #1).
        Dummy rows carry an out-of-range slot index and mode="drop"."""

        @functools.partial(jax.jit, donate_argnums=tuple(range(10)))
        def set_slots(tokens, lengths, active, temp, topk, topp, adapter,
                      pos_delta, limit, stop_ids,
                      slots, toks, lens, temps, topks, topps, adapters,
                      deltas, limits, stop_rows):
            return (
                tokens.at[slots].set(toks, mode="drop"),
                lengths.at[slots].set(lens, mode="drop"),
                active.at[slots].set(True, mode="drop"),
                temp.at[slots].set(temps, mode="drop"),
                topk.at[slots].set(topks, mode="drop"),
                topp.at[slots].set(topps, mode="drop"),
                adapter.at[slots].set(adapters, mode="drop"),
                pos_delta.at[slots].set(deltas, mode="drop"),
                limit.at[slots].set(limits, mode="drop"),
                stop_ids.at[slots].set(stop_rows, mode="drop"),
            )

        return set_slots

    def _build_set_slot(self):
        # tokens not donated: the first sampled token may still be aliased by
        # a prefill drain handle (first_token_handle)
        @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
        def set_slot(tokens, lengths, active, temp, topk, topp, adapter, pos_delta,
                     limit, stop_ids,
                     slot, token, length, temp_v, topk_v, topp_v, adapter_v, delta_v,
                     limit_v, stop_row):
            return (
                tokens.at[slot].set(token),
                lengths.at[slot].set(length),
                active.at[slot].set(True),
                temp.at[slot].set(temp_v),
                topk.at[slot].set(topk_v),
                topp.at[slot].set(topp_v),
                adapter.at[slot].set(adapter_v),
                pos_delta.at[slot].set(delta_v),
                limit.at[slot].set(limit_v),
                stop_ids.at[slot].set(stop_row),
            )

        return set_slot

    MAX_STOP = 8  # in-program stop ids per slot (eos + extras; host enforces
    # the full list at drain — overshoot writes land in the null page)

    def _stop_row(self, sp: SamplingParams) -> np.ndarray:
        row = np.full((self.MAX_STOP,), -1, np.int32)
        ids = [] if sp.ignore_eos else [self.spec.eos_token_id]
        ids += [t for t in sp.stop_token_ids if t not in ids]
        for i, t in enumerate(ids[: self.MAX_STOP]):
            row[i] = t
        return row

    def _limit_for(self, prompt_len: int, sp: SamplingParams) -> int:
        # device length cap: after the program advances lengths to
        # prompt_len + max_tokens - 1 the slot has max_tokens generated
        # tokens (the first came from prefill); max_seq_len guards the pool
        return min(prompt_len + max(sp.max_tokens, 1) - 1,
                   self.config.max_seq_len - 1)

    def _prefill_fn(self, lpad: int, want_plp: bool, with_mm: bool = False):
        fn = self._prefill_fns.get((lpad, want_plp, with_mm))
        if fn is None:
            spec, dtype, impl = self.spec, self.compute_dtype, self._prefill_attn_impl

            lora_on = self._lora_bank is not None

            @functools.partial(jax.jit, donate_argnums=(1, 2, 11, 12))
            def prefill_fn(params, k_pool, v_pool, ids, length, pages, temp, top_k, top_p,
                           key, adapter, r_conv, r_state, slot, bias, mm=None):
                k_pool, v_pool, last_hidden, plp, r_rows = smodel.prefill(
                    params, spec, k_pool, v_pool, ids, length, pages,
                    compute_dtype=dtype, attn_impl=impl, want_prompt_logprobs=want_plp,
                    adapter_idx=adapter if lora_on else None, mm=mm,
                )
                # seed this slot's recurrent decode state (GDN layers)
                r_conv = [
                    (rc if row is None else rc.at[slot].set(row[0]))
                    for rc, row in zip(r_conv, r_rows)
                ]
                r_state = [
                    (rs if row is None else rs.at[slot].set(row[1]))
                    for rs, row in zip(r_state, r_rows)
                ]
                logits = smodel.logits_from_hidden(params, spec, last_hidden[None], dtype)
                # first-token constraint mask (zeros when unconstrained —
                # same compiled program either way)
                logits = logits + bias[None]
                tok, lp = sample_tokens(logits, temp, top_k, top_p, key)
                return k_pool, v_pool, tok[0], lp[0], plp, r_conv, r_state

            fn = self._prefill_fns[(lpad, want_plp, with_mm)] = prefill_fn
        return fn

    def _vision_fn(self):
        """Jitted vision tower over a padded patch bucket (retraces per
        bucket shape): (patches, seg, pos_idx, pos_w, coords) ->
        (merged [R, out_D], deepstack [n_ds, R, out_D])."""
        if not self._vision_fns:
            vspec, dtype = self.spec.vision, self.compute_dtype

            @jax.jit
            def vision_fn(params, patches, seg, pos_idx, pos_w, coords):
                from prime_rl_tpu.models.vision import vision_forward

                return vision_forward(params["vision"], vspec, patches, seg,
                                      pos_idx, pos_w, coords, compute_dtype=dtype)

            self._vision_fns[0] = vision_fn
        return self._vision_fns[0]

    def _prep_mm(self, req: _Request, n: int, lpad: int):
        """Host-side VLM prep + vision-tower run for one request. Returns
        (mm device dict for prefill, pos_delta int)."""
        from prime_rl_tpu.models.vision import (
            mrope_dim_select,
            prep_image_slots,
            prep_mrope_position_ids,
            prep_patch_metadata,
        )

        spec, vspec = self.spec, self.spec.vision
        grid = np.asarray(req.mm["image_grid_thw"], np.int64)
        pixels = np.asarray(req.mm["pixel_values"], np.float32)
        pb = _bucket(max(pixels.shape[0], 1), self._mm_buckets)
        meta = prep_patch_metadata(grid, vspec, pad_to=pb)
        if pixels.shape[0] < pb:
            pixels = np.pad(pixels, ((0, pb - pixels.shape[0]), (0, 0)))
        ids_np = np.asarray(req.prompt, np.int32)
        mpos = prep_mrope_position_ids(
            ids_np, grid, vspec.spatial_merge_size,
            spec.image_token_id, spec.video_token_id,
        )  # [3, n]
        pos_delta = int(mpos.max()) + 1 - n
        rot_half = int(spec.head_dim * spec.partial_rotary_factor) // 2
        sel = mrope_dim_select(tuple(spec.mrope_section), rot_half)
        pf = mpos[sel].T.astype(np.int32)  # [n, rot//2] per-frequency positions
        pf = np.pad(pf, ((0, lpad - n), (0, 0)))
        slots = np.full((lpad,), -1, np.int32)
        slots[:n] = prep_image_slots(
            ids_np, spec.image_token_id, spec.video_token_id,
            max_slots=int(grid.prod(axis=1).sum()) // vspec.merge_unit)

        merged, ds = self._vision_fn()(
            self.params, jnp.asarray(pixels), jnp.asarray(meta["seg_ids"]),
            jnp.asarray(meta["pos_idx"]), jnp.asarray(meta["pos_w"]),
            jnp.asarray(meta["rope_coords"]),
        )
        mm = {
            "vis_embed": merged,
            "ds_feats": ds,
            "img_slot": jnp.asarray(slots)[None],
            "positions": jnp.asarray(pf)[None],
        }
        return mm, pos_delta

    def _chunk_fn(self, c: int):
        fn = self._chunk_fns.get(c)
        if fn is None:
            spec, dtype = self.spec, self.compute_dtype

            lora_on = self._lora_bank is not None

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def chunk_fn(params, k_pool, v_pool, ids, offset, valid, pages_chunk, page_row,
                         adapter):
                return smodel.prefill_chunk(
                    params, spec, k_pool, v_pool, ids, offset, valid,
                    pages_chunk, page_row, compute_dtype=dtype,
                    adapter_idx=adapter if lora_on else None,
                )

            fn = self._chunk_fns[c] = chunk_fn
        return fn

    def _sample_hidden(self, hidden, temp, topk, topp, key, bias=None):
        if self._sample_hidden_fn is None:
            spec, dtype = self.spec, self.compute_dtype

            @jax.jit
            def sample_hidden(params, hidden, temp, topk, topp, key, bias):
                logits = smodel.logits_from_hidden(params, spec, hidden[None], dtype)
                logits = logits + bias[None]
                tok, lp = sample_tokens(logits, temp, topk, topp, key)
                return tok[0], lp[0]

            self._sample_hidden_fn = sample_hidden
        return self._sample_hidden_fn(
            self.params, hidden, temp, topk, topp, key,
            bias if bias is not None else self._zero_bias())

    def _zero_bias(self) -> jax.Array:
        if getattr(self, "_zero_bias_arr", None) is None:
            self._zero_bias_arr = jnp.zeros((self.spec.vocab_size,), jnp.float32)
        return self._zero_bias_arr

    # -- public API ---------------------------------------------------------

    def submit(self, prompt: list[int], params: SamplingParams | None = None,
               on_token=None, request_id: str | None = None,
               mm: dict | None = None, inject: dict | None = None) -> Future:
        req = _Request(list(prompt), params or SamplingParams(), Future(), on_token,
                       request_id=request_id, mm=mm, inject=inject)
        if req.params.constrained and (self.is_hybrid or inject is not None
                                       or req.params.extract_kv):
            req.future.set_exception(ValueError(
                "constrained decoding is not supported for hybrid-recurrent "
                "models or P/D (extract_kv / injected) requests"))
            return req.future
        with self._lock:
            self.pending.append(req)
            if request_id is not None:
                self._by_id[request_id] = req
        return req.future

    def abort(self, request_id: str) -> bool:
        """Cancel a request (client disconnect / orchestrator off-policy
        cancel, reference: dispatcher.py:272-303). Thread-safe: only flags —
        the engine loop finalizes with reason "aborted" on its next step."""
        with self._lock:
            req = self._by_id.pop(request_id, None)
        if req is None:
            return False
        req.aborted = True
        self.stats["requests_aborted"] += 1
        return True

    def has_work(self) -> bool:
        return bool(self.pending or self.active or self._inflight)

    def pause(self) -> None:
        self.paused = True

    def resume(self) -> None:
        self.paused = False

    def _init_lora_bank(self) -> None:
        """Zero-initialized device bank: row 0 is the no-adapter identity
        (B = 0 -> zero delta), rows 1..N hold loaded adapters. Static shapes:
        the decode program never recompiles on adapter load (the vLLM punica
        multi-LoRA analogue; reference: inference/vllm/server.py:98-147).

        The bank serves the dense projections (q/k/v/o/gate/up/down) the
        batched forward applies per request. Per-expert (moe_*) and MLA
        latent (q_b/kv_a/kv_b) targets are train-side only — serve those
        adapters merged (models/lora.merge_lora snapshot)."""
        from prime_rl_tpu.models.lora import _TARGET_DIMS, resolve_targets, target_dims

        cfg = self.lora_config
        na = cfg.max_adapters + 1
        nl, r = self.spec.num_layers, cfg.rank
        bank: dict[str, jax.Array] = {}
        for t in resolve_targets(cfg, self.spec):
            if t not in _TARGET_DIMS:
                raise ValueError(
                    f"LoRA target {t!r} is not servable via the adapter bank "
                    f"(servable: {sorted(_TARGET_DIMS)}); merge the adapter "
                    "into a weight snapshot instead (models/lora.merge_lora)")
            din, dout = target_dims(t, self.spec)
            bank[f"{t}_a"] = jnp.zeros((na, nl, din, r), jnp.float32)
            bank[f"{t}_b"] = jnp.zeros((na, nl, r, dout), jnp.float32)
        self._lora_bank = bank
        self._free_adapter_rows = list(range(1, na))

    def _attach_lora(self, serving_params: Params) -> Params:
        if self._lora_bank is None:
            return serving_params
        scale = jnp.float32(self.lora_config.alpha / self.lora_config.rank)
        for l, lp in enumerate(serving_params["layers"]):
            # build the dict COMPLETE before publishing it on the layer:
            # load_adapter runs on the server thread while the engine thread
            # may be tracing a program that reads lp["lora"] — a two-step
            # mutation raced the tracer into a KeyError on "scale"
            new = {k: v[:, l] for k, v in self._lora_bank.items()}
            new["scale"] = scale
            lp["lora"] = new
        return serving_params

    def load_adapter(self, name: str, layers: dict) -> None:
        """Install (or refresh) an adapter into the bank. ``layers``: stacked
        {"q_a": [NL, in, r], "q_b": [NL, r, out], ...} (models/lora.py
        adapter_from_state_dict). Live requests keep their current rows.
        Cross-thread safe (step lock): the params swap must not interleave
        with a tracing/dispatching engine iteration."""
        if self._lora_bank is None:
            raise RuntimeError("engine built without lora_config")
        with self._step_lock:
            return self._load_adapter_locked(name, layers)

    def _load_adapter_locked(self, name: str, layers: dict) -> None:
        row = self.adapters.get(name)
        if row is None:
            if not self._free_adapter_rows:
                raise RuntimeError(f"adapter bank full ({self.lora_config.max_adapters})")
            row = self._free_adapter_rows.pop(0)
        for key, arr in layers.items():
            if key not in self._lora_bank:
                raise ValueError(f"adapter tensor {key!r} not in the serving bank targets")
            if arr.shape != self._lora_bank[key].shape[1:]:
                raise ValueError(
                    f"{key}: adapter shape {arr.shape} != bank {self._lora_bank[key].shape[1:]} "
                    "(rank/targets must match inference.lora config)")
            self._lora_bank[key] = self._lora_bank[key].at[row].set(
                jnp.asarray(arr, jnp.float32))
        self.adapters[name] = row
        self.params = self._attach_lora(self.params)

    def unload_adapter(self, name: str) -> bool:
        with self._step_lock:
            return self._unload_adapter_locked(name)

    def _unload_adapter_locked(self, name: str) -> bool:
        row = self.adapters.pop(name, None)
        if row is None:
            return False
        for key in self._lora_bank:
            self._lora_bank[key] = self._lora_bank[key].at[row].set(0.0)
        self._free_adapter_rows.append(row)
        self.params = self._attach_lora(self.params)
        return True

    def _prepare_params(self, params: Params, donate: bool = False) -> Params:
        """Cast + unstack (+ optional int8 quantize) as ONE jitted program:
        per-leaf host dispatches cost ~3.6 s per weight update through a
        remote tunnel (~300 slice/cast ops), vs one dispatch here. Jit
        outputs are fresh buffers, which also guarantees the engine NEVER
        aliases the caller's arrays — in colocated mode the trainer hands
        its LIVE params and its next train step DONATES them (an aliased
        engine param would die mid-serving: "Array has been deleted").

        ``donate=True`` hands the INPUT buffers to the program (the without-
        donation path holds input + output together — 2x model HBM, which
        OOMs 4B-class serving startup on a 16 GB chip). Only for callers
        that own the arrays and never touch them again (weight receivers,
        /update_weights reloads, entrypoint startup) — NEVER colocated."""
        jits = getattr(self, "_prepare_jits", None)
        if jits is None:
            jits = self._prepare_jits = {}
        if donate not in jits:
            spec, dtype, quant = self.spec, self.compute_dtype, self.quantize

            def prep(p):
                p = jax.tree.map(lambda x: x.astype(dtype), p)
                out = smodel.unstack_params(p, spec)
                if quant == "int8":
                    out = smodel.quantize_params(out, spec)
                return out

            jits[donate] = jax.jit(
                prep, donate_argnums=(0,) if donate else ())
        out = jits[donate](params)
        if self.mesh is not None:
            from prime_rl_tpu.sampler.sharding import shard_serving_params

            out = shard_serving_params(out, self.mesh)
        return self._attach_lora(out)

    def update_params(self, new_params: Params, version: int | None = None,
                      donate: bool = False) -> None:
        """Swap weights between dispatches (caller pauses for a version-atomic
        boundary across a batch of requests). Cross-thread safe: the step
        lock keeps the swap out of a mid-flight engine iteration.
        ``donate=True`` reuses the caller's buffers for the swap (halves the
        transient HBM) — only when the caller never touches them again
        (filesystem reloads, weight-plane receivers); NEVER colocated."""
        with self._step_lock:
            return self._update_params_locked(new_params, version, donate)

    def _update_params_locked(self, new_params: Params, version: int | None,
                              donate: bool = False) -> None:
        self._drain(force=True)  # complete steps sampled under the old policy
        self.params = self._prepare_params(new_params, donate=donate)
        # cached prefix KV was computed under the old weights — flush (the
        # version-salt analogue of reference dispatcher.py:437-441)
        self.slots.flush_cache()
        if self._host_tier is not None:
            self._host_tier.clear()
            self._host_tier_bytes = 0
        if self._state_tier is not None:
            self._state_tier.clear()
            self._state_tier_bytes = 0
        if version is not None:
            self.policy_version = version

    # -- scheduler ----------------------------------------------------------

    ADMIT_WINDOW = 64  # skip-over scan depth over the pending queue (also
    # the batched-prefill grouping window: a 64-request burst forms full
    # 8-row batches in one pass)
    HOL_MAX_STRIKES = 256  # anti-starvation: stop skipping a stuck head

    def step(self) -> bool:
        """One engine iteration: admit prefills (skip-over, not FIFO-blocked),
        dispatch a pipelined decode step, drain completed outputs.
        Returns True if any work was done."""
        if self.paused:
            return False
        with self._step_lock:
            return self._step_locked()

    def _step_locked(self) -> bool:
        did = False
        # finalize aborts flagged from other threads
        for a in list(self.active.values()):
            if not a.done and a.req.aborted:
                self._finish(a, "aborted")
                did = True
        t0 = time.perf_counter()
        did |= self._admit_pending()
        t1 = time.perf_counter()
        live = any(not a.done for a in self.active.values())
        if live and not self._pipe_full():
            self._dispatch_decode()
            did = True
        t2 = time.perf_counter()
        self._drain(force=not did)
        t3 = time.perf_counter()
        # host-path split (VERDICT r4 #1: profile the drain path) — the
        # decode e2e gap lives in whichever of these rivals the ~80 ms
        # device block; exposed via /metrics as host_admit/dispatch/drain_s
        self.stats["host_admit_s"] = self.stats.get("host_admit_s", 0.0) + (t1 - t0)
        self.stats["host_dispatch_s"] = self.stats.get("host_dispatch_s", 0.0) + (t2 - t1)
        self.stats["host_drain_s"] = self.stats.get("host_drain_s", 0.0) + (t3 - t2)
        return did or bool(self._inflight)

    def _reject(self, req: _Request, exc: Exception) -> None:
        with self._lock:
            try:
                self.pending.remove(req)
            except ValueError:
                pass
            if req.request_id is not None:
                self._by_id.pop(req.request_id, None)
        self.stats["requests_rejected"] += 1
        if not req.future.done():
            req.future.set_exception(exc)

    PREFILL_BATCH_SIZES = (8, 4, 2)  # largest-first; each is one compile

    def _batchable(self, req: _Request) -> bool:
        """Eligible for the batched plain prefill program: standard-attention
        request on a homogeneous-"A" model with no special surfaces."""
        sp = req.params
        n = max(len(req.prompt), 1)
        return (not req.aborted and req.mm is None and req.inject is None
                and not sp.extract_kv and not sp.prompt_logprobs
                and sp.max_tokens >= 1
                # explicit seed => single path: the batched program folds all
                # rows' seeds into ONE shared key, so a seeded request's first
                # token would depend on batch composition (ADVICE r4 #3)
                and sp.seed is None
                # constrained => single path (first-token mask bias)
                and not sp.constrained
                and n <= self.buckets[-1]
                and n + 1 <= self.config.max_seq_len
                and (not sp.adapter or sp.adapter in self.adapters))

    def _admit_batch_plain(self) -> bool:
        """Batch same-bucket pending prefills into ONE program: per-request
        prefill is dispatch-bound on remote runtimes (~75 ms fixed cost
        each), so an admission burst of R requests serializes R of them —
        batching amortizes it B-fold (reference: vLLM's batched prefill
        scheduler). Cache-hit requests fall through to the single path where
        the prefix actually gets reused."""
        if (self.is_hybrid or self.spec.kv_lora_rank > 0
                or self.spec.layer_pattern or self.spec.gdn_pattern
                or self.spec.vision is not None):
            return False
        from prime_rl_tpu.sampler.cache import hash_pages

        with self._lock:
            window = list(self.pending)[: self.ADMIT_WINDOW]
        groups: dict[tuple, list] = {}
        for req in window:
            if not self._batchable(req):
                continue
            n = max(len(req.prompt), 1)
            groups.setdefault(
                (_bucket(n, self.buckets), req.params.adapter or ""), []
            ).append(req)
        any_admitted = False
        ps = self.config.page_size
        for (lpad, adapter), reqs in groups.items():
            while len(reqs) >= 2:
                bsz = next((b for b in self.PREFILL_BATCH_SIZES
                            if b <= len(reqs)), 2)
                chunk, reqs = reqs[:bsz], reqs[bsz:]
                acquired = []
                for req in chunk:
                    n = max(len(req.prompt), 1)
                    hashes = []
                    if self.slots.cache is not None:
                        n_shareable = ((n - 1) // ps) * ps
                        salt = (req.params.cache_salt, req.params.adapter)
                        hashes = hash_pages(req.prompt[:n_shareable], ps, salt=salt)
                        if hashes and self.slots.cache.match_len(hashes) > 0:
                            continue  # single path reuses the cached prefix
                    got = self.slots.acquire(self._acquire_want(req, n), hashes)
                    if got is None:
                        break  # out of slots/pages: stop growing this batch
                    acquired.append((req, got[0], n))
                if len(acquired) < 2:
                    for req, slot, _n in acquired:
                        self.slots.cancel_donation(slot)  # pages never written
                        self.slots.release(slot)
                    return any_admitted
                self._dispatch_prefill_batch(acquired, lpad, adapter)
                any_admitted = True
        return any_admitted

    def _prefill_batch_fn(self, lpad: int, bsz: int):
        fn = self._prefill_fns.get(("batch", lpad, bsz))
        if fn is None:
            spec, dtype, impl = self.spec, self.compute_dtype, self._prefill_attn_impl
            lora_on = self._lora_bank is not None

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def prefill_b(params, k_pool, v_pool, ids, lengths, pages,
                          temp, top_k, top_p, key, adapter):
                k_pool, v_pool, last_hidden = smodel.prefill_batch(
                    params, spec, k_pool, v_pool, ids, lengths, pages,
                    compute_dtype=dtype, attn_impl=impl,
                    adapter_idx=adapter if lora_on else None,
                )
                logits = smodel.logits_from_hidden(params, spec, last_hidden, dtype)
                tok, lp = sample_tokens(logits, temp, top_k, top_p, key)
                return k_pool, v_pool, tok, lp

            fn = self._prefill_fns[("batch", lpad, bsz)] = prefill_b
        return fn

    def _dispatch_prefill_batch(self, acquired: list, lpad: int, adapter: str) -> None:
        ps = self.config.page_size
        real = len(acquired)
        bsz = next((b for b in reversed(self.PREFILL_BATCH_SIZES) if b >= real),
                   self.PREFILL_BATCH_SIZES[0])
        ids = np.zeros((bsz, lpad), np.int32)
        lengths = np.zeros((bsz,), np.int32)
        pages = np.zeros((bsz, lpad // ps), np.int32)  # dummy rows: null page
        temp = np.ones((bsz,), np.float32)
        topk = np.full((bsz,), -1, np.int32)
        topp = np.ones((bsz,), np.float32)
        seed_mix = self._dispatch_seq + 1
        for b, (req, slot, n) in enumerate(acquired):
            sp = req.params
            self._set_cons(slot, -1)  # reused slot: clear any stale constraint
            ids[b, :n] = req.prompt
            lengths[b] = n
            pages[b] = self.slots.page_table[slot][: lpad // ps]
            temp[b] = sp.temperature
            topk[b] = sp.top_k
            topp[b] = sp.top_p
            seed_mix = (seed_mix * 1000003
                        + (sp.seed if sp.seed is not None else slot + 1)) % (1 << 31)
        adapter_row = jnp.int32(self.adapters.get(adapter, 0) if adapter else 0)
        fn = self._prefill_batch_fn(lpad, bsz)
        (self.k_pool, self.v_pool, tok, lp) = fn(
            self.params, self.k_pool, self.v_pool,
            jnp.asarray(ids), jnp.asarray(lengths), jnp.asarray(pages),
            jnp.asarray(temp), jnp.asarray(topk), jnp.asarray(topp),
            jax.random.key(seed_mix), adapter_row,
        )
        self._table_dirty = True
        try:  # land the first tokens behind the program in the stream
            tok.copy_to_host_async()
            lp.copy_to_host_async()
        except Exception:
            pass
        s_cap = self.config.max_slots
        slots_arr = np.full((bsz,), s_cap + 1, np.int32)  # dummy rows drop
        lens_arr = np.zeros((bsz,), np.int32)
        limits_arr = np.zeros((bsz,), np.int32)
        stop_rows = np.full((bsz, self.MAX_STOP), -1, np.int32)
        for b, (req, slot, n) in enumerate(acquired):
            sp = req.params
            self.slots.lengths[slot] = n
            self._shadow_lengths[slot] = n
            self.stats["requests_admitted"] += 1
            self.stats["prefill_tokens_computed"] += n
            active = _Active(req, slot)
            active.first_token_handle = (tok, lp, b)  # shared [B] vectors
            self.active[slot] = active
            limit = self._limit_for(n, sp)
            self._host_limit[slot] = limit
            slots_arr[b] = slot
            lens_arr[b] = n
            limits_arr[b] = limit
            stop_rows[b] = self._stop_row(sp)
            with self._lock:
                try:
                    self.pending.remove(req)
                except ValueError:
                    pass
        if self._set_slot_batch_fn is None:
            self._set_slot_batch_fn = self._build_set_slot_batch()
        # ONE program seeds every admitted slot (dispatch amortized B-fold)
        (self._d_tokens, self._d_lengths, self._d_active,
         self._d_temp, self._d_topk, self._d_topp, self._d_adapter,
         self._d_pos_delta, self._d_limit, self._d_stop) = self._set_slot_batch_fn(
            self._d_tokens, self._d_lengths, self._d_active,
            self._d_temp, self._d_topk, self._d_topp, self._d_adapter,
            self._d_pos_delta, self._d_limit, self._d_stop,
            jnp.asarray(slots_arr), tok, jnp.asarray(lens_arr),
            jnp.asarray(temp), jnp.asarray(topk), jnp.asarray(topp),
            jnp.full((bsz,), adapter_row, jnp.int32),
            jnp.zeros((bsz,), jnp.int32), jnp.asarray(limits_arr),
            jnp.asarray(stop_rows),
        )

    def _admit_pending(self) -> bool:
        """Admit every pending request that fits right now. The head never
        hard-blocks the queue: smaller requests behind it are admitted
        (skip-over) until the head has been passed over HOL_MAX_STRIKES
        times, after which admission waits for it (no starvation)."""
        any_admitted = self._admit_batch_plain()
        progress = True
        while progress and self.pending:
            progress = False
            with self._lock:
                window = list(self.pending)[: self.ADMIT_WINDOW]
            for i, req in enumerate(window):
                if req.aborted:
                    with self._lock:
                        try:
                            self.pending.remove(req)
                        except ValueError:
                            pass
                    if not req.future.done():
                        req.future.set_result(GenerationResult(
                            [], [], "aborted", len(req.prompt),
                            policy_version=self.policy_version))
                    progress = True
                    break
                n = max(len(req.prompt), 1)
                # requests that can NEVER fit fail fast instead of wedging
                total_pool_tokens = (self.config.num_pages - 1) * self.config.page_size
                if n + 1 > self.config.max_seq_len or n + 1 > total_pool_tokens:
                    self._reject(req, MemoryError(
                        f"prompt of {n} tokens cannot fit "
                        f"(max_seq_len={self.config.max_seq_len}, pool={total_pool_tokens})"))
                    progress = True
                    break
                if req.params.adapter and req.params.adapter not in self.adapters:
                    self._reject(req, ValueError(
                        f"unknown LoRA adapter {req.params.adapter!r} "
                        f"(loaded: {sorted(self.adapters)})"))
                    progress = True
                    break
                if req.params.prompt_logprobs and n > self.buckets[-1]:
                    self._reject(req, ValueError(
                        f"prompt_logprobs needs a single-shot prefill; prompt of {n} "
                        f"tokens exceeds the largest bucket {self.buckets[-1]}"))
                    progress = True
                    break
                if req.mm is not None and n > self.buckets[-1]:
                    self._reject(req, ValueError(
                        f"multimodal prompts need a single-shot prefill; prompt of {n} "
                        f"tokens exceeds the largest bucket {self.buckets[-1]}"))
                    progress = True
                    break
                if req.mm is not None and self.spec.vision is None:
                    self._reject(req, ValueError(
                        f"model family {self.spec.family!r} takes no multimodal inputs"))
                    progress = True
                    break
                if i > 0 and self._hol_strikes > self.HOL_MAX_STRIKES:
                    break  # head has waited long enough: stop skipping it
                if self._try_admit(req):
                    with self._lock:
                        try:
                            self.pending.remove(req)
                        except ValueError:
                            pass
                    if i == 0:
                        self._hol_strikes = 0
                    any_admitted = True
                    progress = True
                    break
                if i == 0:
                    self._hol_strikes += 1
        return any_admitted

    def _try_admit(self, req: _Request) -> bool:
        """Reserve a slot + pages (reusing any cached prefix) and prefill."""
        from prime_rl_tpu.sampler.cache import hash_pages

        sp = req.params
        n = max(len(req.prompt), 1)
        ps = self.config.page_size
        if self.is_hybrid and n > self.buckets[-1] and (
                self._state_tier is None or sp.prompt_logprobs or req.mm is not None):
            self._reject(req, ValueError(
                f"hybrid model: prompt length {n} exceeds the largest prefill "
                f"bucket {self.buckets[-1]} and this request cannot use chunked "
                "prefill (needs state_cache_mb > 0, no prompt_logprobs, no mm)"))
            return True
        if sp.constrained:
            # compile/validate BEFORE reserving a slot: a bad schema/regex
            # rejects the request (never crashes the engine loop), and a
            # bank full of OTHER live constraints defers admission (False =
            # stays pending, retried when a constrained request finishes)
            try:
                self._ensure_token_tables()
                cc = self._cons_compile(sp)
            except Exception as e:  # noqa: BLE001 — reject, don't kill serving
                self._reject(req, e)
                return True
            if (cc.key not in self._cons_bank_keys
                    and all(r > 0 for r in self._cons_bank_refs)):
                return False
        hashes: list[int] = []
        # mm requests skip prefix reuse: identical image-pad token runs would
        # false-share pages across DIFFERENT images (the hash sees only ids)
        if (self.slots.cache is not None and not sp.prompt_logprobs
                and req.mm is None and req.inject is None and not sp.extract_kv):
            # shareable: full pages strictly before the last prompt token
            # (at least one token is always computed → last_hidden exists)
            n_shareable = ((n - 1) // ps) * ps
            salt = (sp.cache_salt, sp.adapter)
            hashes = hash_pages(req.prompt[:n_shareable], ps, salt=salt)
        # hybrid: page reuse is only exact up to a recurrent-state checkpoint
        # — cap the chain at the deepest boundary that has BOTH the page
        # chain and a state snapshot
        max_shared = None
        snap = None
        if self.is_hybrid:
            max_shared = 0
            if hashes and self._state_tier is not None:
                m = self.slots.cache.match_len(hashes)
                for j in range(m - 1, -1, -1):
                    got_snap = self._state_tier.get(hashes[j])
                    if got_snap is not None:
                        self._state_tier.move_to_end(hashes[j])
                        max_shared, snap = j + 1, got_snap
                        break
        # pre-allocate pages for the whole request so the page table never
        # changes during decode (no mid-stream host->device table pushes)
        got = self.slots.acquire(self._acquire_want(req, n), hashes,
                                 max_shared=max_shared)
        if got is None:
            return False
        slot, n_shared = got
        if self.is_hybrid and n_shared != (max_shared or 0):
            # defensive (lookup increfs before any eviction, so the matched
            # chain cannot shrink — but a mismatch here would recompute into
            # shared pages): fall back to a fresh unshared admission
            self.slots.cancel_donation(slot)
            self.slots.release(slot)
            got = self.slots.acquire(self._acquire_want(req, n))
            if got is None:
                return False
            slot, n_shared = got
            snap = None
        if hashes and self._host_tier is not None and n_shared < len(hashes):
            n_shared += self._restore_host_pages(hashes, n_shared, slot)
        self.stats["requests_admitted"] += 1
        self.stats["prefill_tokens_cached"] += n_shared * ps
        try:
            self._admit(req, slot, n, n_shared, hashes=hashes, snap=snap)
        except Exception as e:
            # per-request isolation: a bad payload (e.g. a mismatched P/D
            # inject blob) rejects THIS request; the engine loop survives.
            # The slot's pages may never have been written — never donate.
            self.slots.lengths[slot] = 0
            self.slots.cancel_donation(slot)
            self.slots.release(slot)
            self.active.pop(slot, None)
            self._reject(req, e)
        return True

    def _acquire_want(self, req: _Request, n: int) -> int:
        """Token span to reserve pages for: whole request + single-shot pad."""
        lpad = _bucket(n, self.buckets) if n <= self.buckets[-1] else 0
        return min(max(lpad, n + req.params.max_tokens + 1), self.config.max_seq_len)

    def warmup(self, n_requests: int = 8, prompt_len: int = 32) -> None:
        """Pre-compile the hot serving programs (batched + single prefill,
        full-block decode) with dummy requests BEFORE real traffic: the
        first compile of each program takes minutes on remote runtimes and
        would otherwise burn live requests' HTTP timeouts (vLLM warms up at
        startup for the same reason)."""
        import time as _t

        t0 = _t.perf_counter()
        mk = lambda n: [[(i + 7) % 97 + 1 for i in range(prompt_len)]
                        for _ in range(n)]
        sp = SamplingParams(max_tokens=self.decode_block + 1, temperature=1.0,
                            ignore_eos=True)
        self.generate(mk(max(1, n_requests)), sp)
        # every batched-prefill size gets its compile here, not as a
        # multi-second stall mid-traffic
        for b in self.PREFILL_BATCH_SIZES:
            if b < max(1, n_requests):
                self.generate(mk(b), sp)
        # the compiled-under-pressure decode block too (pending admissions)
        if self.decode_block > 4:
            self._decode_fn_for(max(1, self.decode_block // 4))
        self.slots.flush_cache()  # dummy pages must never prefix-hit
        get_logger().info(
            f"engine warmup: {_t.perf_counter() - t0:.1f}s "
            f"({len(self._prefill_fns)} prefill + {len(self._decode_fns)} decode programs)")

    def run_until_idle(self) -> None:
        while self.has_work():
            if not self.step():
                with self._step_lock:
                    self._drain(force=True)

    def generate(
        self, prompts: list[list[int]], params: SamplingParams | list[SamplingParams] | None = None,
        mm: list[dict | None] | None = None,
    ) -> list[GenerationResult]:
        """Synchronous batch helper (tests / offline eval)."""
        if not isinstance(params, list):
            params = [params] * len(prompts)
        if mm is None:
            mm = [None] * len(prompts)
        futures = [self.submit(p, sp, mm=m) for p, sp, m in zip(prompts, params, mm)]
        self.run_until_idle()
        return [f.result() for f in futures]

    # -- internals ----------------------------------------------------------

    def _admit(self, req: _Request, slot: int, n: int, n_shared: int = 0,
               hashes: list[int] | None = None, snap=None) -> None:
        sp = req.params
        ps = self.config.page_size
        shared_tokens = n_shared * ps
        self.slots.lengths[slot] = n
        self._shadow_lengths[slot] = n
        if self._h_cons_idx[slot] >= 0:
            self._set_cons(slot, -1)  # reused slot: clear stale constraint
            # (the constrained admit below re-assigns its own row)
        # defer the table upload to the next decode dispatch: prefill uses
        # its own `pages` argument, and admitting a burst of requests would
        # otherwise pay one full host->device table push EACH
        self._table_dirty = True
        if req.inject is not None:
            return self._admit_injected(req, slot, n)
        self.stats["prefill_tokens_computed"] += n - shared_tokens
        adapter_row = jnp.int32(self.adapters.get(sp.adapter, 0) if sp.adapter else 0)
        cons_row, cons_bias = -1, None
        if sp.constrained:
            self._ensure_token_tables()
            cc = self._cons_compile(sp)
            cons_row = self._cons_assign(cc)
            cons_bias = self._cons_prefill_bias(cc)
        seed = sp.seed if sp.seed is not None else (self._dispatch_seq + slot + 1)
        key = jax.random.key(seed)
        temp = jnp.asarray([sp.temperature], jnp.float32)
        topk = jnp.asarray([sp.top_k], jnp.int32)
        topp = jnp.asarray([sp.top_p], jnp.float32)
        if self.is_hybrid and (shared_tokens > 0 or n > self.buckets[-1]
                               or (self._state_tier is not None and hashes)):
            return self._admit_hybrid_chunked(
                req, slot, n, n_shared, hashes or [], snap,
                adapter_row, temp, topk, topp, key)
        plp = None
        pos_delta = 0
        if shared_tokens == 0 and n <= self.buckets[-1]:
            # fused single-shot prefill (flash attention over the bucket)
            lpad = _bucket(n, self.buckets)
            ids = np.zeros((1, lpad), np.int32)
            ids[0, :n] = req.prompt
            pages = np.asarray(
                self.slots.page_table[slot][: lpad // ps], np.int32
            )
            with_mm = req.mm is not None
            mm_dev = None
            if with_mm:
                mm_dev, pos_delta = self._prep_mm(req, n, lpad)
            fn = self._prefill_fn(lpad, sp.prompt_logprobs, with_mm)
            (self.k_pool, self.v_pool, tok, lp, plp,
             self.r_conv, self.r_state) = fn(
                self.params, self.k_pool, self.v_pool,
                jnp.asarray(ids), jnp.int32(n), jnp.asarray(pages),
                temp, topk, topp, key, adapter_row,
                self.r_conv, self.r_state, jnp.int32(slot),
                cons_bias if cons_bias is not None else self._zero_bias(),
                **({"mm": mm_dev} if with_mm else {}),
            )
        else:
            # incremental prefill: skip the cached prefix, process the rest
            # in page-aligned chunks attending to the full paged history
            c = min(self.config.prefill_chunk, self.config.max_seq_len)
            c = max(ps, (c // ps) * ps)
            row = self.slots.page_table[slot]
            row_dev = jnp.asarray(row)
            n_chunk_pages = c // ps
            last_hidden = None
            for off in range(shared_tokens, n, c):
                valid = min(c, n - off)
                ids = np.zeros((1, c), np.int32)
                ids[0, :valid] = req.prompt[off : off + valid]
                pchunk = np.zeros((n_chunk_pages,), np.int32)
                seg = row[off // ps : off // ps + n_chunk_pages]
                pchunk[: len(seg)] = seg
                fn = self._chunk_fn(c)
                self.k_pool, self.v_pool, last_hidden = fn(
                    self.params, self.k_pool, self.v_pool,
                    jnp.asarray(ids), jnp.int32(off), jnp.int32(valid),
                    jnp.asarray(pchunk), row_dev, adapter_row,
                )
            tok, lp = self._sample_hidden(last_hidden, temp, topk, topp, key,
                                          bias=cons_bias)
        active = _Active(req, slot)
        active.first_token_handle = (tok, lp)
        try:  # overlap the tiny first-token fetch with later device work
            tok.copy_to_host_async()
            lp.copy_to_host_async()
        except Exception:
            pass
        if sp.extract_kv:
            # P/D prefill role: hand the request's KV pages + first token to
            # the caller and release the slot — no decode happens here
            # (reference: optimized P/D deployment; NIXL KV transfer role)
            active.kv = self._extract_kv_payload(slot, n, pos_delta)
            self.active[slot] = active
            self._finish(active, "length")
            return
        if sp.prompt_logprobs and plp is not None:
            active.prompt_logprobs_handle = plp
        self.active[slot] = active
        # seed device state (async; ordering preserved by dispatch stream)
        limit = self._limit_for(n, sp)
        self._host_limit[slot] = limit
        (self._d_tokens, self._d_lengths, self._d_active,
         self._d_temp, self._d_topk, self._d_topp, self._d_adapter,
         self._d_pos_delta, self._d_limit, self._d_stop) = self._set_slot_fn(
            self._d_tokens, self._d_lengths, self._d_active,
            self._d_temp, self._d_topk, self._d_topp, self._d_adapter,
            self._d_pos_delta, self._d_limit, self._d_stop,
            jnp.int32(slot), tok, jnp.int32(n),
            jnp.float32(sp.temperature), jnp.int32(sp.top_k), jnp.float32(sp.top_p),
            adapter_row, jnp.int32(pos_delta),
            jnp.int32(limit), jnp.asarray(self._stop_row(sp)),
        )
        self._set_cons(slot, cons_row)
        if cons_row >= 0:
            self._cons_bank_refs[cons_row] += 1
            self._cons_active += 1
        if sp.max_tokens <= 0:
            self._finalize_scoring_only(active)

    def _hybrid_chunk_fn(self, c: int):
        """Jitted hybrid prefill chunk: threads the slot's recurrent rows
        (conv window + SSM/fast-weight state) between chunks so attention
        layers page normally while GDN/Mamba layers continue exactly."""
        fn = self._chunk_fns.get(("h", c))
        if fn is None:
            spec, dtype = self.spec, self.compute_dtype
            lora_on = self._lora_bank is not None

            @functools.partial(jax.jit, donate_argnums=(1, 2, 9, 10))
            def chunk_fn(params, k_pool, v_pool, ids, offset, valid, pages_chunk,
                         page_row, adapter, r_conv, r_state, slot):
                rows_in = [
                    None if rc is None else (rc[slot], rs[slot])
                    for rc, rs in zip(r_conv, r_state)
                ]
                k_pool, v_pool, last_hidden, rows_out = smodel.prefill_chunk(
                    params, spec, k_pool, v_pool, ids, offset, valid,
                    pages_chunk, page_row, compute_dtype=dtype,
                    adapter_idx=adapter if lora_on else None, r_rows=rows_in,
                )
                r_conv = [rc if ro is None else rc.at[slot].set(ro[0])
                          for rc, ro in zip(r_conv, rows_out)]
                r_state = [rs if ro is None else rs.at[slot].set(ro[1])
                           for rs, ro in zip(r_state, rows_out)]
                return k_pool, v_pool, last_hidden, r_conv, r_state

            fn = self._chunk_fns[("h", c)] = chunk_fn
        return fn

    def _set_slot_state_fn(self):
        if getattr(self, "_set_state_fn", None) is None:
            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def set_state(r_conv, r_state, slot, rows):
                r_conv = [rc if ro is None else rc.at[slot].set(ro[0])
                          for rc, ro in zip(r_conv, rows)]
                r_state = [rs if ro is None else rs.at[slot].set(ro[1])
                           for rs, ro in zip(r_state, rows)]
                return r_conv, r_state

            self._set_state_fn = set_state
        return self._set_state_fn

    def _set_slot_state(self, slot: int, snap) -> None:
        """Write a recurrent-state snapshot (or zeros) into the slot's rows
        before a chunked hybrid prefill starts."""
        if snap is None:
            if getattr(self, "_zero_snap", None) is None:
                self._zero_snap = [
                    None if rc is None else
                    (np.zeros(rc.shape[1:], rc.dtype),
                     np.zeros(rs.shape[1:], np.float32))
                    for rc, rs in zip(self.r_conv, self.r_state)
                ]
            snap = self._zero_snap
        rows = [None if r is None else (jnp.asarray(r[0]), jnp.asarray(r[1]))
                for r in snap]
        self.r_conv, self.r_state = self._set_slot_state_fn()(
            self.r_conv, self.r_state, jnp.int32(slot), rows)

    def _donate_state(self, h: int, slot: int) -> None:
        """Checkpoint the slot's recurrent rows into the host state tier
        under page-chain hash ``h`` (boundary = end of the hashed chain)."""
        if self._state_tier is None or h in self._state_tier:
            return
        rows = jax.device_get([
            None if rc is None else (rc[slot], rs[slot])
            for rc, rs in zip(self.r_conv, self.r_state)
        ])
        nbytes = sum(r[0].nbytes + r[1].nbytes for r in rows if r is not None)
        budget = self.config.state_cache_mb * (1 << 20)
        while self._state_tier and self._state_tier_bytes + nbytes > budget:
            _, old = self._state_tier.popitem(last=False)
            self._state_tier_bytes -= sum(
                r[0].nbytes + r[1].nbytes for r in old if r is not None)
        if nbytes <= budget:
            self._state_tier[h] = rows
            self._state_tier_bytes += nbytes
            self.stats["state_snapshots"] = self.stats.get("state_snapshots", 0) + 1

    def _admit_hybrid_chunked(self, req: _Request, slot: int, n: int,
                              n_shared: int, hashes: list[int], snap,
                              adapter_row, temp, topk, topp, key) -> None:
        """Chunked prefill for recurrent-state (GDN/Mamba hybrid) models:
        restore the boundary state snapshot (zeros for a fresh start), run
        page-aligned chunks threading the recurrent rows, checkpoint the
        state at the last full-page boundary so later prompts sharing the
        prefix skip it entirely. vLLM has no analogue — hybrid models there
        get neither chunked prefill nor prefix caching."""
        sp = req.params
        ps = self.config.page_size
        shared = n_shared * ps
        n_shareable = len(hashes) * ps
        if snap is not None and n_shared:
            self._set_slot_state(slot, snap)
            self.stats["state_restores"] = self.stats.get("state_restores", 0) + 1
        else:
            self._set_slot_state(slot, None)
        c = min(self.config.prefill_chunk, self.config.max_seq_len)
        c = max(ps, (c // ps) * ps)
        row = self.slots.page_table[slot]
        row_dev = jnp.asarray(row)
        n_chunk_pages = c // ps
        fn = self._hybrid_chunk_fn(c)
        last_hidden = None

        def run(lo: int, hi: int):
            nonlocal last_hidden
            for off in range(lo, hi, c):
                valid = min(c, hi - off)
                ids = np.zeros((1, c), np.int32)
                ids[0, :valid] = req.prompt[off: off + valid]
                pchunk = np.zeros((n_chunk_pages,), np.int32)
                seg = row[off // ps: off // ps + n_chunk_pages]
                pchunk[: len(seg)] = seg
                (self.k_pool, self.v_pool, last_hidden,
                 self.r_conv, self.r_state) = fn(
                    self.params, self.k_pool, self.v_pool,
                    jnp.asarray(ids), jnp.int32(off), jnp.int32(valid),
                    jnp.asarray(pchunk), row_dev, adapter_row,
                    self.r_conv, self.r_state, jnp.int32(slot),
                )

        # phase 1: compute up to the shareable boundary, checkpoint there
        run(shared, n_shareable)
        if hashes and shared < n_shareable:
            self._donate_state(hashes[-1], slot)
        # phase 2: the tail past the boundary (always >= 1 token)
        run(max(shared, n_shareable), n)
        tok, lp = self._sample_hidden(last_hidden, temp, topk, topp, key)
        active = _Active(req, slot)
        active.first_token_handle = (tok, lp)
        try:  # overlap the tiny first-token fetch with later device work
            tok.copy_to_host_async()
            lp.copy_to_host_async()
        except Exception:
            pass
        if sp.extract_kv:
            # P/D prefill role: paged KV + recurrent rows + first token
            active.kv = self._extract_kv_payload(slot, n, 0)
            self.active[slot] = active
            self._finish(active, "length")
            return
        self.active[slot] = active
        limit = self._limit_for(n, sp)
        self._host_limit[slot] = limit
        (self._d_tokens, self._d_lengths, self._d_active,
         self._d_temp, self._d_topk, self._d_topp, self._d_adapter,
         self._d_pos_delta, self._d_limit, self._d_stop) = self._set_slot_fn(
            self._d_tokens, self._d_lengths, self._d_active,
            self._d_temp, self._d_topk, self._d_topp, self._d_adapter,
            self._d_pos_delta, self._d_limit, self._d_stop,
            jnp.int32(slot), tok, jnp.int32(n),
            jnp.float32(sp.temperature), jnp.int32(sp.top_k), jnp.float32(sp.top_p),
            adapter_row, jnp.int32(0),
            jnp.int32(limit), jnp.asarray(self._stop_row(sp)),
        )
        if sp.max_tokens <= 0:
            self._finalize_scoring_only(active)

    def _spill_page(self, h: int, page: int) -> None:
        """Evict sink: copy one page's KV to the host tier (LRU, bounded)."""
        rows = jnp.asarray([page], jnp.int32)
        k_np, v_np = jax.device_get(self._gather_pages_fn()(
            self.k_pool, self.v_pool, rows))
        nbytes = k_np.nbytes + v_np.nbytes
        budget = self.config.host_cache_mb * (1 << 20)
        while self._host_tier and self._host_tier_bytes + nbytes > budget:
            _, (ko, vo) = self._host_tier.popitem(last=False)
            self._host_tier_bytes -= ko.nbytes + vo.nbytes
        if nbytes <= budget:
            self._host_tier[h] = (k_np, v_np)
            self._host_tier_bytes += nbytes
            self.stats["kv_pages_spilled"] = self.stats.get("kv_pages_spilled", 0) + 1

    def _restore_host_pages(self, hashes: list[int], n_shared: int, slot: int) -> int:
        """Continue a device prefix-cache chain from the host tier: upload
        matching page contents into the slot's next owned pages. Returns the
        number of pages restored."""
        if self._host_tier is None:
            return 0
        chain = []
        for h in hashes[n_shared:]:
            got = self._host_tier.get(h)
            if got is None:
                break
            self._host_tier.move_to_end(h)
            chain.append(got)
        if not chain:
            return 0
        rows = jnp.asarray(
            self.slots.page_table[slot][n_shared : n_shared + len(chain)], jnp.int32)
        k_new = jnp.asarray(np.concatenate([k for k, _ in chain], axis=2))
        v_new = jnp.asarray(np.concatenate([v for _, v in chain], axis=2))
        self.k_pool, self.v_pool = self._scatter_pages(k_new, v_new, rows)
        self.stats["kv_pages_restored"] = self.stats.get("kv_pages_restored", 0) + len(chain)
        return len(chain)

    def _scatter_pages(self, k_new, v_new, rows):
        """Jitted per-page-count scatter into the pools (shared by P/D
        injection and the host-tier restore). ``k_new``/``v_new`` stack the
        paged (non-None) layers only, in layer order; ``v_new`` may be None
        (MLA without a DSA indexer side)."""
        n_pages = int(rows.shape[0])

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scatter(k_pool, v_pool, k_new, v_new, rows):
            from prime_rl_tpu.sampler.model import _write_pages

            k_out, v_out = [], []
            i = j = 0
            for kl in k_pool:
                if kl is None:
                    k_out.append(None)
                else:
                    k_out.append(_write_pages(kl, k_new[i].astype(kl.dtype), rows))
                    i += 1
            for vl in v_pool:
                if vl is None or v_new is None:
                    v_out.append(vl)
                else:
                    v_out.append(_write_pages(vl, v_new[j].astype(vl.dtype), rows))
                    j += 1
            return k_out, v_out

        if getattr(self, "_scatter_fns", None) is None:
            self._scatter_fns = {}
        fn = self._scatter_fns.setdefault((n_pages, v_new is not None), scatter)
        return fn(self.k_pool, self.v_pool, k_new, v_new, rows)

    def _gather_pages_fn(self):
        """Jitted page gather for P/D extraction / host-tier spill: pools +
        page rows -> ([NL', NKV, n_pages, PS, HD] k, same v). None pool
        entries (hybrid recurrent layers; MLA's unused V side) are skipped —
        the stack covers the paged layers only, in layer order (both P/D
        engines share the spec, so the mapping is implicit)."""
        if getattr(self, "_gather_fn", None) is None:
            @jax.jit
            def gather(k_pool, v_pool, rows):
                k = jnp.stack([jnp.take(kl, rows, axis=1)
                               for kl in k_pool if kl is not None])
                vs = [jnp.take(vl, rows, axis=1)
                      for vl in v_pool if vl is not None]
                return (k, jnp.stack(vs)) if vs else (k,)

            self._gather_fn = gather
        return self._gather_fn

    def _extract_kv_payload(self, slot: int, n: int, pos_delta: int) -> dict:
        """P/D prefill role: the request's paged KV (+ recurrent rows for
        hybrid models, + DSA indexer pages riding the V pool for MLA) as a
        host payload the decode engine injects (reference: optimized P/D
        deployment, NIXL KV-transfer role)."""
        ps = self.config.page_size
        n_pages = -(-n // ps)
        rows = jnp.asarray(self.slots.page_table[slot][:n_pages], jnp.int32)
        out = self._gather_pages_fn()(self.k_pool, self.v_pool, rows)
        got = jax.device_get(out)
        payload = {"k": got[0], "v": got[1] if len(got) > 1 else None,
                   "pos_delta": int(pos_delta)}
        if self.is_hybrid:
            payload["r"] = jax.device_get([
                None if rc is None else (rc[slot], rs[slot])
                for rc, rs in zip(self.r_conv, self.r_state)
            ])
        return payload

    def _admit_injected(self, req: _Request, slot: int, n: int) -> None:
        """P/D decode role: write a prefill engine's KV pages into this
        engine's pool and start decoding from the shipped first token."""
        sp = req.params
        ps = self.config.page_size
        inj = req.inject
        n_pages = -(-n // ps)
        rows = jnp.asarray(self.slots.page_table[slot][:n_pages], jnp.int32)
        k_np = np.asarray(inj["k"])
        v_np = None if inj.get("v") is None else np.asarray(inj["v"])
        if k_np.shape[2] != n_pages:
            raise ValueError(
                f"injected KV has {k_np.shape[2]} pages, request needs {n_pages} "
                "(page_size must match between prefill and decode engines)")

        self.k_pool, self.v_pool = self._scatter_pages(
            jnp.asarray(k_np), None if v_np is None else jnp.asarray(v_np), rows)
        if self.is_hybrid:
            # hybrid models: the prefill engine's recurrent rows (conv
            # window + SSM/fast-weight state) seed this slot's decode state
            r_rows = inj.get("r")
            if r_rows is None or len(r_rows) != len(self.r_conv):
                raise ValueError(
                    "hybrid P/D injection needs the prefill engine's "
                    "recurrent rows ('r', one entry per layer)")
            self._set_slot_state(slot, [
                None if r is None else (np.asarray(r[0]), np.asarray(r[1]))
                for r in r_rows
            ])
        self.stats["prefill_tokens_cached"] += n  # imported, not computed

        first_tok = int(inj["first_token"])
        first_lp = float(inj.get("first_logprob", 0.0))
        pos_delta = int(inj.get("pos_delta", 0))
        adapter_row = jnp.int32(self.adapters.get(sp.adapter, 0) if sp.adapter else 0)
        active = _Active(req, slot)
        active.first_token_handle = (np.int32(first_tok), np.float32(first_lp))
        self.active[slot] = active
        limit = self._limit_for(n, sp)
        self._host_limit[slot] = limit
        (self._d_tokens, self._d_lengths, self._d_active,
         self._d_temp, self._d_topk, self._d_topp, self._d_adapter,
         self._d_pos_delta, self._d_limit, self._d_stop) = self._set_slot_fn(
            self._d_tokens, self._d_lengths, self._d_active,
            self._d_temp, self._d_topk, self._d_topp, self._d_adapter,
            self._d_pos_delta, self._d_limit, self._d_stop,
            jnp.int32(slot), jnp.int32(first_tok), jnp.int32(n),
            jnp.float32(sp.temperature), jnp.int32(sp.top_k), jnp.float32(sp.top_p),
            adapter_row, jnp.int32(pos_delta),
            jnp.int32(limit), jnp.asarray(self._stop_row(sp)),
        )
        if sp.max_tokens <= 1:
            self._fetch_first_token(active)
            self._finish(active, "length")

    def _finalize_scoring_only(self, a: _Active) -> None:
        self._fetch_first_token(a)
        a.generated.clear()
        a.logprobs.clear()
        self._finish(a, "length")

    def _fetch_first_token(self, a: _Active) -> None:
        if a.first_token_handle is None:
            return
        h = a.first_token_handle
        if len(h) == 3:
            # batched prefill: the handle is (tok [B], lp [B], row). ONE
            # np.asarray fetches the whole row vector (async-prefetched at
            # dispatch; jax caches the host copy on the ArrayImpl), so the 8
            # actives of a batch share one transfer instead of paying a
            # tunnel round-trip EACH for their scalar slice (VERDICT r4 #1:
            # the host drain path)
            tok_arr, lp_arr, b = h
            t, l = int(np.asarray(tok_arr)[b]), float(np.asarray(lp_arr)[b])
        else:
            tok, lp = h
            t, l = int(tok), float(lp)
        a.generated.append(t)
        a.logprobs.append(l)
        a.first_token_handle = None
        if a.req.on_token is not None:
            a.req.on_token(t, l)

    def _pick_block(self, slots: list[int]) -> int:
        """Adaptive k, two values only (each distinct k is its own compiled
        program — a tunnel compile costs minutes, so no shrink ladder):
        full decode_block when the batch is stable; decode_block/4 while
        BLOCKED pending requests wait for a slot, so a finishing slot is
        noticed (drained) within a quarter-block instead of a full one.
        step() admits before dispatching, so non-empty pending here always
        means blocked-on-capacity, not merely unprocessed."""
        if self.decode_block <= 1:
            return 1
        if self.pending:
            return max(1, self.decode_block // 4)
        return self.decode_block

    def _pipe_full(self) -> bool:
        """In-flight budget: LOOKAHEAD is a TOKEN budget (hides per-dispatch
        host latency); at least two programs ride concurrently so the device
        never idles while the host drains."""
        return (sum(st.k for st in self._inflight) >= self.LOOKAHEAD
                and len(self._inflight) >= 2)

    def _dispatch_decode(self) -> None:
        if self._table_dirty:
            self._d_table = jnp.asarray(self.slots.page_table)
            self._table_dirty = False
        slots = sorted(s for s, a in self.active.items() if not a.done)
        k_steps = self._pick_block(slots)
        use_cons = self._cons_active > 0  # constrained fn only when needed:
        # zero masking cost on the unconstrained hot path
        cons_args = ()
        if use_cons:
            cons_args = (self._d_cons_trans, self._d_cons_accept,
                         self._d_cons_idx, self._d_dfa,
                         self._tok_chars, self._tok_lens)
        (self.k_pool, self.v_pool, self._d_tokens, self._d_lengths,
         self._d_active, self._d_key, packed, routed_k,
         self.r_conv, self.r_state, dfa_out) = self._decode_fn_for(
            k_steps, use_cons)(
            self.params, self.k_pool, self.v_pool,
            self._d_tokens, self._d_lengths, self._d_active, self._d_table,
            self._d_temp, self._d_topk, self._d_topp, self._d_key, self._d_adapter,
            self._d_pos_delta, self.r_conv, self.r_state,
            self._d_limit, self._d_stop, *cons_args,
        )
        if use_cons:
            self._d_dfa = dfa_out
        # start the device->host copy NOW, right behind the program in the
        # stream — the drain then reads a (mostly) already-landed buffer
        # instead of paying the full round-trip at fetch time
        try:
            packed.copy_to_host_async()
            if routed_k is not None:
                routed_k.copy_to_host_async()
        except Exception:
            pass
        self._dispatch_seq += 1
        self._inflight.append(_StepOutput(self._dispatch_seq, packed,
                                          slots, routed_k, k=k_steps))

    def _drain(self, force: bool = False) -> None:
        if not self._inflight:
            if force:
                # no decode steps in flight (e.g. a scoring-only request that
                # never dispatched): release finished slots NOW, or the
                # engine spins forever with a non-empty `active`
                self._process_deferred(self._dispatch_seq, drained_all=True)
            return
        if not force and not self._pipe_full():
            return
        # drain the OLDEST program(s) only, leaving the rest queued on the
        # device: fetching the whole pipeline would idle the chip for a full
        # host round-trip + token-processing pass every LOOKAHEAD tokens
        # (measured 4x e2e loss at 64 slots). Forced drains (pause/update/
        # shutdown) still flush everything.
        if force:
            steps = list(self._inflight)
            self._inflight.clear()
        else:
            steps = [self._inflight.popleft()]
        try:
            fetched = jax.device_get([(st.packed, st.routed) for st in steps])
        except Exception as first_err:
            # remote runtimes flap: a transient fetch failure must not kill
            # the whole serving process (reference posture: per-request error
            # isolation; the orchestrator re-dispatches). Retry once; if the
            # buffers are truly poisoned, fail the AFFECTED requests only and
            # keep serving.
            import time as _t

            _t.sleep(1.0)
            try:
                fetched = jax.device_get([(st.packed, st.routed) for st in steps])
            except Exception:
                get_logger().error(
                    f"drain fetch failed twice ({type(first_err).__name__}: "
                    f"{first_err}); failing {sum(len(st.slots) for st in steps)} "
                    "slot-steps and continuing")
                affected = {s for st in steps for s in st.slots}
                for s in affected:
                    a = self.active.get(s)
                    if a is not None and not a.done:
                        a.first_token_handle = None  # device handle is dead
                        if not a.req.future.done():
                            a.req.future.set_exception(RuntimeError(
                                "decode output lost to a device fetch failure"))
                        a.done = True
                        if a.req.request_id is not None:
                            with self._lock:
                                self._by_id.pop(a.req.request_id, None)
                        self._d_active = self._deactivate_fn(
                            self._d_active, jnp.int32(a.slot))
                        self._deferred_release.append((a.slot, self._dispatch_seq))
                self._process_deferred(self._dispatch_seq, drained_all=True)
                return
        for step, (packed, routed) in zip(steps, fetched):
            tokens = packed[..., 0].astype(np.int64)
            logprobs = packed[..., 1]
            for i in range(step.k):
                for s in step.slots:
                    a = self.active.get(s)
                    if a is None or a.done:
                        continue  # finished earlier; extra tokens discarded
                    if routed is not None:
                        # row i CONSUMED the slot's previous token: its
                        # routing belongs to generated[len(a.routed)]
                        if len(a.routed) < len(a.generated) + (a.first_token_handle is not None):
                            a.routed.append(np.asarray(routed[i, s]))
                    if a.first_token_handle is not None:
                        self._fetch_first_token(a)
                        self._post_append_checks(a)
                        if a.done:
                            continue
                    self._shadow_lengths[s] += 1
                    self._append_token(a, int(tokens[i, s]), float(logprobs[i, s]))
            self._process_deferred(step.seq)
        if force:
            self._process_deferred(self._dispatch_seq, drained_all=not self._inflight)

    def _process_deferred(self, drained_seq: int, drained_all: bool = False) -> None:
        still = []
        for slot, seq in self._deferred_release:
            if seq <= drained_seq or drained_all:
                self.slots.release(slot)
                del self.active[slot]
            else:
                still.append((slot, seq))
        self._deferred_release = still

    def _post_append_checks(self, a: _Active) -> None:
        sp = a.req.params
        token = a.generated[-1]
        stop = set(sp.stop_token_ids) | (set() if sp.ignore_eos else {self.spec.eos_token_id})
        if token in stop:
            self._finish(a, "stop")
        elif len(a.generated) >= sp.max_tokens:
            self._finish(a, "length")
        elif self._shadow_lengths[a.slot] + 1 >= self.config.max_seq_len:
            self._finish(a, "length")

    def _append_token(self, a: _Active, token: int, logprob: float) -> None:
        if a.done or len(a.generated) >= a.req.params.max_tokens:
            self._finish(a, "length")
            return
        a.generated.append(token)
        a.logprobs.append(logprob)
        if a.req.on_token is not None:
            a.req.on_token(token, logprob)
        self._post_append_checks(a)

    def _finish(self, a: _Active, reason: str) -> None:
        if a.done:
            return
        a.done = True
        if a.req.request_id is not None:
            with self._lock:
                self._by_id.pop(a.req.request_id, None)
        self._fetch_first_token(a)
        plp = None
        if a.prompt_logprobs_handle is not None:
            plp = [float(x) for x in np.asarray(a.prompt_logprobs_handle)[: len(a.req.prompt)]]
        # stop generating for this slot as of the NEXT dispatch; pages stay
        # reserved until every already-dispatched step has drained
        self._d_active = self._deactivate_fn(self._d_active, jnp.int32(a.slot))
        self._deferred_release.append((a.slot, self._dispatch_seq))
        self._cons_release_slot(a.slot)
        routed = None
        if self._collect_routed and a.routed and a.generated:
            rows = [np.asarray(r, np.int32) for r in a.routed[: len(a.generated)]]
            pad = np.full_like(rows[0], -1)
            while len(rows) < len(a.generated):
                rows.append(pad)
            routed = np.stack(rows)
        a.req.future.set_result(
            GenerationResult(
                token_ids=list(a.generated),
                logprobs=list(a.logprobs),
                finish_reason=reason,
                prompt_len=len(a.req.prompt),
                prompt_logprobs=plp,
                policy_version=self.policy_version,
                routed_experts=routed,
                kv=a.kv,
            )
        )


class EngineLoop:
    """Background thread driving ``engine.step()`` (the server's run loop)."""

    def __init__(self, engine: Engine):
        self.engine = engine
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self) -> None:
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=10)

    def _run(self) -> None:
        logger = get_logger()
        while not self._stop.is_set():
            try:
                if not self.engine.step():
                    time.sleep(0.002)
            except Exception:
                logger.exception("engine step failed")
                time.sleep(0.1)
