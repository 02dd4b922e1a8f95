"""Paged KV cache: device pool + host page allocator.

TPU-native replacement for vLLM's paged KV block manager (reference:
SURVEY.md §2.4 — the inference layer outsources this to vLLM). Layout is
chosen for the Pallas paged-attention kernel:

    k/v: [num_layers, num_kv_heads, num_pages, page_size, head_dim]  bf16

The allocator is plain host Python (a free list); the device only ever sees
a page table ``[max_slots, pages_per_slot] int32`` and per-slot lengths.
Page 0 is reserved as the null page so unused table entries stay valid.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.models.base import ModelSpec


@dataclass(frozen=True)
class CacheConfig:
    num_pages: int = 1024
    page_size: int = 64
    max_slots: int = 32
    max_seq_len: int = 4096

    @property
    def pages_per_slot(self) -> int:
        return -(-self.max_seq_len // self.page_size)


class KVPool:
    """Device-side pool; functionally updated (donated) inside jitted steps.

    Layout: one buffer PER LAYER (a list) — the serving forward unrolls the
    layer loop so scatters update each buffer in place; a stacked [NL, ...]
    pool under lax.scan would be fully rewritten every decode step."""

    def __init__(self, spec: ModelSpec, config: CacheConfig, dtype=jnp.bfloat16):
        self.spec = spec
        self.config = config
        shape = (
            spec.num_kv_heads,
            config.num_pages,
            config.page_size,
            spec.head_dim,
        )
        self.k = [jnp.zeros(shape, dtype) for _ in range(spec.num_layers)]
        self.v = [jnp.zeros(shape, dtype) for _ in range(spec.num_layers)]

    def hbm_bytes(self) -> int:
        per = self.k[0].size * self.k[0].dtype.itemsize
        return 2 * per * len(self.k)


class PageAllocator:
    """Host free-list; page 0 reserved as the null page."""

    def __init__(self, config: CacheConfig):
        self.config = config
        self.free: list[int] = list(range(config.num_pages - 1, 0, -1))
        self.slot_pages: dict[int, list[int]] = {}

    @property
    def num_free(self) -> int:
        return len(self.free)

    def can_fit(self, num_tokens: int) -> bool:
        return len(self.free) >= -(-num_tokens // self.config.page_size)

    def allocate(self, slot: int, num_tokens: int) -> list[int]:
        """Ensure ``slot`` has pages covering num_tokens; returns full list."""
        pages = self.slot_pages.setdefault(slot, [])
        need = -(-num_tokens // self.config.page_size) - len(pages)
        if need > len(self.free):
            raise MemoryError(f"KV pool exhausted: need {need}, free {len(self.free)}")
        for _ in range(max(0, need)):
            pages.append(self.free.pop())
        return pages

    def release(self, slot: int) -> None:
        pages = self.slot_pages.pop(slot, [])
        self.free.extend(reversed(pages))


class SlotTable:
    """Host mirror of the device page table + lengths for all slots."""

    def __init__(self, config: CacheConfig):
        self.config = config
        self.page_table = np.zeros((config.max_slots, config.pages_per_slot), np.int32)
        self.lengths = np.zeros((config.max_slots,), np.int32)
        self.free_slots: list[int] = list(range(config.max_slots - 1, -1, -1))
        self.alloc = PageAllocator(config)

    def acquire(self, num_tokens: int) -> int | None:
        """Find a slot + pages for a prompt of ``num_tokens``; None if full."""
        if not self.free_slots or not self.alloc.can_fit(num_tokens):
            return None
        slot = self.free_slots.pop()
        pages = self.alloc.allocate(slot, num_tokens)
        self.page_table[slot, : len(pages)] = pages
        self.page_table[slot, len(pages):] = 0
        self.lengths[slot] = num_tokens
        return slot

    def extend(self, slot: int, new_len: int) -> bool:
        """Grow a slot to ``new_len`` tokens; False if out of pages."""
        if new_len > self.config.max_seq_len:
            return False
        try:
            pages = self.alloc.allocate(slot, new_len)
        except MemoryError:
            return False
        self.page_table[slot, : len(pages)] = pages
        self.lengths[slot] = new_len
        return True

    def release(self, slot: int) -> None:
        self.alloc.release(slot)
        self.page_table[slot] = 0
        self.lengths[slot] = 0
        self.free_slots.append(slot)
