"""Continuous-batching sampling engine — the first-party replacement for the
reference's vLLM inference layer (reference: SURVEY.md §2.4 "vLLM" row).

Architecture (TPU-first):
- ONE decode program for all slots, jitted once: [S] tokens in, [S] tokens
  out, paged-attention over the shared KV pool, fused sampling. Decode cost
  does not depend on how many requests are active (static shapes).
- Prefill jitted per bucketed prompt length; writes K/V pages and samples the
  first token in the same program. Optional prompt_logprobs in-program
  (the prefill-scoring surface, reference: utils/client.py:599).
- Host side owns only the scheduler: slot/page allocation (cache.py),
  request queue, stop conditions. Every device interaction is one jitted
  call per engine step.
- Weight update = swapping the params pytree between steps (pause/resume
  protocol, reference: inference/vllm/server.py:70-147) — in-flight requests
  keep their KV cache: the next decode step simply reads new weights, which
  is exactly the reference's in-place update semantics.
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
from prime_rl_tpu.sampler.cache import CacheConfig, KVPool, SlotTable
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


@dataclass
class GenerationResult:
    token_ids: list[int]  # completion tokens
    logprobs: list[float]
    finish_reason: str  # "stop" | "length" | "aborted"
    prompt_len: int
    prompt_logprobs: list[float] | None = None
    policy_version: int = -1


@dataclass
class _Request:
    prompt: list[int]
    params: SamplingParams
    future: Future


@dataclass
class _Active:
    req: _Request
    slot: int
    generated: list[int] = field(default_factory=list)
    logprobs: list[float] = field(default_factory=list)
    prompt_logprobs: list[float] | None = None


def _bucket(n: int, buckets: list[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds max bucket {buckets[-1]}")


class Engine:
    """Single-host sampling engine over one (possibly sharded) params pytree."""

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
    ):
        self.spec = spec
        self.compute_dtype = compute_dtype
        self.params = jax.tree.map(lambda x: jnp.asarray(x, compute_dtype), params)
        self.config = cache_config or CacheConfig()
        pool = KVPool(spec, self.config, dtype=compute_dtype)
        self.k_pool, self.v_pool = pool.k, pool.v
        self.slots = SlotTable(self.config)
        self.pending: deque[_Request] = deque()
        self.active: dict[int, _Active] = {}
        self.paused = False
        self.policy_version = -1
        self._lock = threading.Lock()
        self._key_counter = seed
        self._prefill_attn_impl = prefill_attn_impl
        self._decode_attn_impl = decode_attn_impl
        ps = self.config.page_size
        self.buckets = [b for b in (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
                        if b <= self.config.max_seq_len and b % ps == 0]
        if not self.buckets or self.buckets[-1] < self.config.max_seq_len:
            self.buckets.append(self.config.max_seq_len)
        self._decode_fn = self._build_decode()
        self._prefill_fns: dict[tuple[int, bool], any] = {}

    # -- jitted programs ----------------------------------------------------

    def _build_decode(self):
        spec, dtype, impl = self.spec, self.compute_dtype, self._decode_attn_impl

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def decode_fn(params, k_pool, v_pool, tokens, lengths, page_table, temp, top_k, top_p, key):
            k_pool, v_pool, logits = smodel.decode(
                params, spec, k_pool, v_pool, tokens, lengths, page_table,
                compute_dtype=dtype, attn_impl=impl,
            )
            out_tokens, out_logprobs = sample_tokens(logits, temp, top_k, top_p, key)
            return k_pool, v_pool, out_tokens, out_logprobs

        return decode_fn

    def _prefill_fn(self, lpad: int, want_plp: bool):
        fn = self._prefill_fns.get((lpad, want_plp))
        if fn is None:
            spec, dtype, impl = self.spec, self.compute_dtype, self._prefill_attn_impl

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def prefill_fn(params, k_pool, v_pool, ids, length, pages, temp, top_k, top_p, key):
                k_pool, v_pool, last_hidden, plp = smodel.prefill(
                    params, spec, k_pool, v_pool, ids, length, pages,
                    compute_dtype=dtype, attn_impl=impl, want_prompt_logprobs=want_plp,
                )
                logits = smodel.logits_from_hidden(params, spec, last_hidden[None], dtype)
                tok, lp = sample_tokens(logits, temp, top_k, top_p, key)
                return k_pool, v_pool, tok[0], lp[0], plp

            fn = self._prefill_fns[(lpad, want_plp)] = prefill_fn
        return fn

    def _next_key(self, seed: int | None = None):
        if seed is None:
            self._key_counter += 1
            seed = self._key_counter
        return jax.random.key(seed)

    # -- public API ---------------------------------------------------------

    def submit(self, prompt: list[int], params: SamplingParams | None = None) -> Future:
        req = _Request(list(prompt), params or SamplingParams(), Future())
        with self._lock:
            self.pending.append(req)
        return req.future

    def has_work(self) -> bool:
        return bool(self.pending or self.active)

    def pause(self) -> None:
        self.paused = True

    def resume(self) -> None:
        self.paused = False

    def update_params(self, new_params: Params, version: int | None = None) -> None:
        """Swap weights between steps (caller is responsible for pausing if it
        wants a version-atomic boundary across a batch of requests)."""
        self.params = jax.tree.map(lambda x: jnp.asarray(x, self.compute_dtype), new_params)
        if version is not None:
            self.policy_version = version

    # -- scheduler ----------------------------------------------------------

    def step(self) -> bool:
        """One engine iteration: admit one prefill if possible, else decode
        all active slots. Returns True if any work was done."""
        if self.paused:
            return False
        if self.pending:
            req = self.pending[0]
            lpad = _bucket(max(len(req.prompt), 1), self.buckets)
            slot = self.slots.acquire(lpad)
            if slot is not None:
                with self._lock:
                    self.pending.popleft()
                self._run_prefill(req, slot, lpad)
                return True
            if not self.active:  # cannot ever fit
                with self._lock:
                    self.pending.popleft()
                req.future.set_exception(
                    MemoryError(f"prompt of {len(req.prompt)} tokens cannot fit in KV pool")
                )
                return True
        if self.active:
            self._run_decode()
            return True
        return False

    def run_until_idle(self) -> None:
        while self.has_work():
            self.step()

    def generate(
        self, prompts: list[list[int]], params: SamplingParams | list[SamplingParams] | None = None
    ) -> list[GenerationResult]:
        """Synchronous batch helper (tests / offline eval)."""
        if not isinstance(params, list):
            params = [params] * len(prompts)
        futures = [self.submit(p, sp) for p, sp in zip(prompts, params)]
        self.run_until_idle()
        return [f.result() for f in futures]

    # -- internals ----------------------------------------------------------

    def _run_prefill(self, req: _Request, slot: int, lpad: int) -> None:
        sp = req.params
        n = len(req.prompt)
        ids = np.zeros((1, lpad), np.int32)
        ids[0, :n] = req.prompt
        pages = np.asarray(self.slots.alloc.slot_pages[slot][: lpad // self.config.page_size], np.int32)
        fn = self._prefill_fn(lpad, sp.prompt_logprobs)
        self.k_pool, self.v_pool, tok, lp, plp = fn(
            self.params, self.k_pool, self.v_pool,
            jnp.asarray(ids), jnp.int32(n), jnp.asarray(pages),
            jnp.asarray([sp.temperature], jnp.float32),
            jnp.asarray([sp.top_k], jnp.int32),
            jnp.asarray([sp.top_p], jnp.float32),
            self._next_key(sp.seed),
        )
        # true cache length = prompt only; the sampled token is written by the
        # next decode step for this slot
        self.slots.lengths[slot] = n
        active = _Active(req, slot)
        if sp.prompt_logprobs:
            active.prompt_logprobs = [float(x) for x in np.asarray(plp)[:n]]
        self.active[slot] = active
        if sp.max_tokens <= 0:
            self._finish(active, "length")
            return
        self._append_token(active, int(tok), float(lp))

    def _run_decode(self) -> None:
        slots = sorted(self.active.keys())
        s_max = self.config.max_slots
        tokens = np.zeros(s_max, np.int32)
        temp = np.ones(s_max, np.float32)
        top_k = np.full(s_max, -1, np.int32)
        top_p = np.ones(s_max, np.float32)
        for s in slots:
            a = self.active[s]
            tokens[s] = a.generated[-1]
            temp[s] = a.req.params.temperature
            top_k[s] = a.req.params.top_k
            top_p[s] = a.req.params.top_p
        lengths = self.slots.lengths.copy()
        self.k_pool, self.v_pool, out_tokens, out_logprobs = self._decode_fn(
            self.params, self.k_pool, self.v_pool,
            jnp.asarray(tokens), jnp.asarray(lengths), jnp.asarray(self.slots.page_table),
            jnp.asarray(temp), jnp.asarray(top_k), jnp.asarray(top_p),
            self._next_key(),
        )
        out_tokens = np.asarray(out_tokens)
        out_logprobs = np.asarray(out_logprobs)
        for s in slots:
            a = self.active[s]
            # the decode step wrote a.generated[-1]'s KV at position lengths[s]
            if not self.slots.extend(s, int(lengths[s]) + 1):
                self._finish(a, "length")
                continue
            self._append_token(a, int(out_tokens[s]), float(out_logprobs[s]))

    def _append_token(self, a: _Active, token: int, logprob: float) -> None:
        a.generated.append(token)
        a.logprobs.append(logprob)
        sp = a.req.params
        stop = set(sp.stop_token_ids) | {self.spec.eos_token_id}
        if token in stop:
            self._finish(a, "stop")
        elif len(a.generated) >= sp.max_tokens:
            self._finish(a, "length")
        elif self.slots.lengths[a.slot] + 1 >= self.config.max_seq_len:
            self._finish(a, "length")

    def _finish(self, a: _Active, reason: str) -> None:
        self.slots.release(a.slot)
        del self.active[a.slot]
        a.req.future.set_result(
            GenerationResult(
                token_ids=a.generated,
                logprobs=a.logprobs,
                finish_reason=reason,
                prompt_len=len(a.req.prompt),
                prompt_logprobs=a.prompt_logprobs,
                policy_version=self.policy_version,
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
