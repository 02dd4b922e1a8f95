"""Token-exact chat renderers (first-party analogue of the reference's
``renderers`` dependency — SURVEY.md §2.6, docs/algorithms.md:482-550).

A renderer turns a message list into exact token ids for the policy
(``render_ids``), parses a completion back into a message
(``parse_response``), and — critically for multi-turn RL — implements the
**extension property** (``bridge_to_next_turn``): rendering turns
incrementally must produce a prefix-extension of the previous render, so a
rollout's flat token stream with per-token masks is consistent with what the
engine actually sampled (the importance ratios depend on this being exact).

``ChatMLRenderer`` covers the ChatML family (Qwen3 templates are ChatML) for
any tokenizer that exposes the im_start/im_end special ids; with the
ByteTokenizer it is fully offline-testable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from prime_rl_tpu.renderers.tokenizer import ByteTokenizer


@dataclass
class RenderedTurn:
    """Incremental render result: tokens appended since the previous turn and
    which of them the policy must produce (vs be prompted with)."""

    token_ids: list[int]
    sampled_mask: list[bool]


class Renderer:
    def render_ids(self, messages: list[dict], add_generation_prompt: bool = True) -> list[int]:
        raise NotImplementedError

    def parse_response(self, token_ids: list[int]) -> dict:
        raise NotImplementedError

    def bridge_to_next_turn(
        self, prev_ids: list[int], messages: list[dict], add_generation_prompt: bool = True
    ) -> RenderedTurn:
        """Tokens to append so ``prev_ids + appended`` equals the render of
        ``messages``. Raises if the new render is not a prefix-extension."""
        full = self.render_ids(messages, add_generation_prompt)
        if full[: len(prev_ids)] != list(prev_ids):
            raise ValueError(
                "render is not a prefix-extension of the previous turn "
                "(extension property violated)"
            )
        appended = full[len(prev_ids):]
        return RenderedTurn(appended, [False] * len(appended))


class ChatMLRenderer(Renderer):
    """<|im_start|>role\\ncontent<|im_end|>\\n per message (Qwen/ChatML)."""

    def __init__(self, tokenizer=None):
        self.tokenizer = tokenizer or ByteTokenizer()

    def render_ids(self, messages: list[dict], add_generation_prompt: bool = True) -> list[int]:
        return self.tokenizer.apply_chat_template(
            messages, tokenize=True, add_generation_prompt=add_generation_prompt
        )

    def parse_response(self, token_ids: list[int]) -> dict:
        ids = list(token_ids)
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if ids and ids[-1] == eos:
            ids = ids[:-1]
        return {"role": "assistant", "content": self.tokenizer.decode(ids)}

    def continuation_ids(
        self,
        new_messages: list[dict],
        add_generation_prompt: bool = True,
        after_completion: bool = False,
        completion_terminated: bool = True,
    ) -> list[int]:
        """Incremental render of the NEXT turn(s) — the best-effort
        interleaving path for multi-turn rollouts: the sampled span stays
        byte-exact in the stream and the renderer supplies only the template
        glue (reference: renderers ``bridge_to_next_turn`` extension
        property, docs/algorithms.md:516-543)."""
        tok = self.tokenizer
        ids: list[int] = []
        if after_completion:
            if not completion_terminated:
                ids.append(tok.eos_token_id)  # close the truncated turn
            ids.extend(tok.encode("\n"))
        ids.extend(self.render_ids(new_messages, add_generation_prompt=False))
        if add_generation_prompt:
            ids.extend(self.render_ids([], add_generation_prompt=True))
        return ids


class TraceBuilder:
    """Accumulates a multi-turn rollout into one flat token stream with
    per-token sampled masks/logprobs/temperatures — the Trace the orchestrator
    trains on (reference: verifiers Trace contract, trajectories.py)."""

    def __init__(self, renderer: ChatMLRenderer):
        self.renderer = renderer
        self.messages: list[dict] = []
        self.token_ids: list[int] = []
        self.sampled_mask: list[bool] = []
        self.logprobs: list[float] = []
        self.temperatures: list[float] = []
        self._after_completion = False
        self._completion_terminated = True

    def add_context(self, messages: list[dict], add_generation_prompt: bool = True) -> list[int]:
        """Append environment/user turns; returns the full prompt ids to send
        to the engine."""
        self.messages.extend(messages)
        ids = self.renderer.continuation_ids(
            messages, add_generation_prompt,
            after_completion=self._after_completion,
            completion_terminated=self._completion_terminated,
        )
        self.token_ids.extend(ids)
        self.sampled_mask.extend([False] * len(ids))
        self.logprobs.extend([0.0] * len(ids))
        self.temperatures.extend([1.0] * len(ids))
        self._after_completion = False
        return list(self.token_ids)

    def add_completion(self, token_ids: list[int], logprobs: list[float],
                       temperature: float) -> dict:
        """Append the engine's sampled tokens; returns the parsed message
        (also recorded so the next render stays prefix-consistent)."""
        self.token_ids.extend(int(t) for t in token_ids)
        self.sampled_mask.extend([True] * len(token_ids))
        self.logprobs.extend(float(x) for x in logprobs)
        self.temperatures.extend([temperature] * len(token_ids))
        message = self.renderer.parse_response(token_ids)
        self.messages.append(message)
        self._after_completion = True
        self._completion_terminated = bool(
            token_ids and token_ids[-1] == self.renderer.tokenizer.eos_token_id
        )
        return message

    def to_trace(self, reward: float | None = None, metrics: dict | None = None):
        from prime_rl_tpu.envs.types import Trace

        return Trace(
            token_ids=list(self.token_ids),
            sampled_mask=list(self.sampled_mask),
            logprobs=list(self.logprobs),
            temperatures=list(self.temperatures),
            reward=reward,
            metrics=metrics or {},
            messages=list(self.messages),
        )


def create_renderer(tokenizer=None, family: str = "chatml") -> Renderer:
    """Registry entry point (reference: create_renderer). Qwen3/debug are
    ChatML; other families register here as they land."""
    if family in ("chatml", "qwen3", "byte", "debug"):
        return ChatMLRenderer(tokenizer)
    raise ValueError(f"no renderer for family {family!r}")
