"""Packer: re-bins TrainingBatches into per-host MicroBatch streams for
multi-host trainers (reference: trainer/rl/packer.py:1-358 SinglePacker +
transport/zmq.py MicroBatch PUB/SUB).

Single-host trainers pack locally (rl/train.py); a multi-host deployment
runs one packer (here) that receives TrainingBatches from the orchestrator,
first-fit packs them into [L] rows, balances rows across hosts by quadratic
cost, and publishes each host's rows over the MicroBatch transport. A
watchdog thread kills the process after a stall (reference: packer.py:23,
62-70 — 30-min default) so a wedged data plane fails fast instead of
hanging the cluster.
"""

from __future__ import annotations

import os
import threading
import time

import numpy as np

from prime_rl_tpu.trainer.batch import balance_rows, pack_rows
from prime_rl_tpu.trainer.step import MicroBatchArrays
from prime_rl_tpu.transport.base import MicroBatchReceiver, MicroBatchSender, TrainingBatchReceiver
from prime_rl_tpu.transport.types import MicroBatch, TrainingBatch
from prime_rl_tpu.utils.logger import get_logger


class _WireSample:
    """Shim presenting a wire row's per-sample slice to ``_assemble_mm``
    (which expects objects with ``token_ids``, ``mm_kwargs``, ``__len__``)."""

    __slots__ = ("token_ids", "mm_kwargs")

    def __init__(self, token_ids: np.ndarray, mm_kwargs: dict | None):
        self.token_ids = token_ids
        self.mm_kwargs = mm_kwargs

    def __len__(self) -> int:
        return len(self.token_ids)


def row_to_wire(row, seq_len: int) -> MicroBatch:
    """PackedRow -> wire MicroBatch ([L] streams, zero-padded)."""
    L = seq_len
    input_ids = np.zeros(L, np.int32)
    loss_mask = np.zeros(L, bool)
    advantages = np.zeros(L, np.float32)
    logprobs = np.zeros(L, np.float32)
    position_ids = np.zeros(L, np.int32)
    temperatures = np.ones(L, np.float32)
    seq_lens: list[int] = []
    env_names: list[str] = []
    optional: dict[str, np.ndarray | None] = {
        "ref_logprobs": None, "rl_weights": None, "ce_weights": None, "ref_kl_weights": None,
    }
    cursor = 0
    for s in row.samples:
        n = len(s)
        sl = slice(cursor, cursor + n)
        input_ids[sl] = s.token_ids
        mask = np.asarray(s.mask, bool).copy()
        mask[0] = False
        loss_mask[sl] = mask
        if s.advantages is not None:
            advantages[sl] = s.advantages
        logprobs[sl] = s.logprobs
        position_ids[sl] = np.arange(n)
        temperatures[sl] = s.temperatures
        for name in optional:
            v = getattr(s, name)
            if v is not None:
                if optional[name] is None:
                    optional[name] = np.zeros(L, np.float32)
                optional[name][sl] = v
        seq_lens.append(n)
        env_names.append(s.env_name)
        cursor += n
    mm_list = None
    if any(getattr(s, "mm_kwargs", None) for s in row.samples):
        # ship each sample's HF-processor vision outputs with the row — the
        # receiving rank rebuilds its micro-batch patch buffers from these
        # (multi-host VLM; reference: trainer/batch.py:576-617)
        mm_list = [getattr(s, "mm_kwargs", None) or None for s in row.samples]
    return MicroBatch(
        input_ids=input_ids, loss_mask=loss_mask, advantages=advantages,
        inference_logprobs=logprobs, position_ids=position_ids,
        temperatures=temperatures, seq_lens=seq_lens, env_names=env_names,
        mm_kwargs_list=mm_list,
        **optional,
    )


def wire_to_arrays(mbs: list[MicroBatch], rows_per_micro_batch: int = 1,
                   num_micro_batches: int | None = None,
                   vlm_spec=None, max_mm_patches: int = 0) -> MicroBatchArrays:
    """Wire rows -> stacked [N, B, L] arrays (+ derived segment ids).
    ``num_micro_batches`` pins N (pad with empty rows; grow if overfull) so
    the train step compiles once across steps.

    ``vlm_spec``: when the model is a VLM and rows carry ``mm_kwargs_list``,
    each micro-batch's vision arrays are assembled here from the shipped
    per-sample processor outputs (the per-rank leg of the multi-host VLM
    contract; ``max_mm_patches`` MUST be pinned in config for world>1 so
    every rank compiles the same patch-buffer shape)."""
    L = len(mbs[0].input_ids)
    B = rows_per_micro_batch
    rows = list(mbs)
    if num_micro_batches is not None:
        rows += [None] * max(0, num_micro_batches * B - len(rows))
    pad = (-len(rows)) % B
    rows = rows + [None] * pad
    n = len(rows) // B

    def seg_ids(mb: MicroBatch | None) -> np.ndarray:
        seg = np.zeros(L, np.int32)
        if mb is not None:
            off = 0
            for i, sl in enumerate(mb.seq_lens, start=1):
                seg[off : off + sl] = i
                off += sl
        return seg

    def stream(mb, name, fill=0.0):
        if mb is None:
            base = np.ones(L, np.float32) if name == "temperatures" else np.zeros(L, np.float32)
            return base
        v = getattr(mb, name)
        return v

    def maybe(name):
        if all(getattr(mb, name) is None for mb in mbs):
            return None
        return np.stack([
            np.stack([
                (getattr(rows[i * B + j], name) if rows[i * B + j] is not None and getattr(rows[i * B + j], name) is not None else np.zeros(L, np.float32))
                for j in range(B)
            ]) for i in range(n)
        ])

    def grid(name):
        return np.stack([
            np.stack([stream(rows[i * B + j], name) for j in range(B)]) for i in range(n)
        ])

    mm: dict[str, np.ndarray] = {}
    if vlm_spec is not None:
        if max_mm_patches <= 0:
            # auto-size uniformly: the packer ships a GLOBAL patch bound with
            # the feed's counts (mm_pad — see Packer.global_counts) and the
            # trainer folds it in before calling here; with no images in the
            # step the minimum pad is a constant, so every rank still lands
            # on the same compiled shape. Pinning batch.max_mm_patches in
            # config remains the way to keep shapes constant ACROSS steps.
            max_mm_patches = 256
        from prime_rl_tpu.trainer.batch import _assemble_mm

        per_mb = []
        for i in range(n):
            row_slots = []
            for j in range(B):
                mb = rows[i * B + j]
                if mb is None:
                    continue
                mlist = mb.mm_kwargs_list or [None] * len(mb.seq_lens)
                cursor = 0
                for sl_len, mk in zip(mb.seq_lens, mlist):
                    row_slots.append((j, cursor, _WireSample(
                        np.asarray(mb.input_ids[cursor : cursor + sl_len]), mk)))
                    cursor += sl_len
            per_mb.append(_assemble_mm(row_slots, (B, L), vlm_spec, max_mm_patches))
        mm = {k: np.stack([d[k] for d in per_mb]) for k in per_mb[0]}

    return MicroBatchArrays(
        **mm,
        input_ids=grid("input_ids").astype(np.int32),
        loss_mask=grid("loss_mask").astype(bool),
        advantages=grid("advantages").astype(np.float32),
        inference_logprobs=grid("inference_logprobs").astype(np.float32),
        position_ids=grid("position_ids").astype(np.int32),
        segment_ids=np.stack([
            np.stack([seg_ids(rows[i * B + j]) for j in range(B)]) for i in range(n)
        ]),
        temperatures=grid("temperatures").astype(np.float32),
        ref_logprobs=maybe("ref_logprobs"),
        rl_weights=maybe("rl_weights"),
        ce_weights=maybe("ce_weights"),
        ref_kl_weights=maybe("ref_kl_weights"),
    )


class Packer:
    def __init__(
        self,
        receiver: TrainingBatchReceiver,
        sender: MicroBatchSender,
        seq_len: int,
        num_ranks: int,
        watchdog_timeout: float = 1800.0,
    ):
        self.receiver = receiver
        self.sender = sender
        self.seq_len = seq_len
        self.num_ranks = num_ranks
        self._last_progress = time.monotonic()
        self._stop = threading.Event()
        self.watchdog_timeout = watchdog_timeout
        self._watchdog = threading.Thread(target=self._watch, daemon=True)

    def _watch(self) -> None:
        while not self._stop.wait(10.0):
            if time.monotonic() - self._last_progress > self.watchdog_timeout:
                get_logger().error(
                    f"packer stalled > {self.watchdog_timeout}s; exiting "
                    f"(reference: packer.py watchdog)"
                )
                os._exit(1)

    @staticmethod
    def global_counts(per_rank: list[list[MicroBatch]]) -> dict[str, int]:
        """Per-component GLOBAL token counts over every rank's rows — shipped
        with each rank's feed so no cross-process reduction is needed for
        the loss Scales (reference: rl/train.py:312-334 all-reduce)."""
        rl = ce = rk = 0
        mm_pad = 0
        for mbs in per_rank:
            rank_patches = 0
            for mb in mbs:
                mask = np.asarray(mb.loss_mask, bool)
                if mb.rl_weights is None:
                    rl += int(mask.sum())
                else:
                    rl += int((mask & (np.asarray(mb.rl_weights) != 0)).sum())
                if mb.ce_weights is not None:
                    ce += int((np.asarray(mb.ce_weights) != 0).sum())
                if mb.ref_kl_weights is not None:
                    rk += int((np.asarray(mb.ref_kl_weights) != 0).sum())
                for mk in (mb.mm_kwargs_list or []):
                    if mk and "pixel_values" in mk:
                        rank_patches += int(np.asarray(mk["pixel_values"]).shape[0])
            mm_pad = max(mm_pad, rank_patches)
        counts = {"rl": rl, "ce": ce, "ref_kl": rk}
        if mm_pad:
            # GLOBAL patch-buffer bound (computed once, shipped to every
            # rank): lets VLM runs auto-size uniformly even when re-binning
            # lands all the images on one rank
            counts["mm_pad"] = max(256, -(-mm_pad // 256) * 256)
        return counts

    def pack(self, batch: TrainingBatch) -> list[list[MicroBatch]]:
        rows = pack_rows(batch.examples, self.seq_len)
        bins = balance_rows(rows, self.num_ranks)
        # every rank must see the same number of micro-batches (all-ranks-
        # same-program); pad short bins with empty rows
        width = max(len(b) for b in bins) if bins else 0
        from prime_rl_tpu.trainer.batch import PackedRow

        per_rank = [
            [row_to_wire(r, self.seq_len) for r in b] + [
                row_to_wire(PackedRow(samples=[]), self.seq_len)
            ] * (width - len(b))
            for b in bins
        ]
        # uniform optional-stream presence across ranks (all-ranks-same-
        # program: one rank materializing ce_weights while another sees None
        # would compile different step programs)
        optional = ("ref_logprobs", "rl_weights", "ce_weights", "ref_kl_weights")
        for name in optional:
            if any(getattr(mb, name) is not None for mbs in per_rank for mb in mbs):
                for mbs in per_rank:
                    for mb in mbs:
                        if getattr(mb, name) is None:
                            setattr(mb, name, np.zeros(self.seq_len, np.float32))
        # multi-tenant routing survives the re-binning: every row carries the
        # batch's run id (reference: MultiPacker round-robin, rl/packer.py)
        if batch.run_idx is not None:
            rid = f"run_{batch.run_idx}"
            for mbs in per_rank:
                for mb in mbs:
                    mb.run_id = rid
        return per_rank

    def run(self, max_batches: int | None = None) -> None:
        self._watchdog.start()
        logger = get_logger()
        seen = 0
        while not self._stop.is_set():
            batch = self.receiver.receive(timeout=1.0)
            if batch is None:
                continue
            per_rank = self.pack(batch)
            self.sender.send(batch.step, per_rank, counts=self.global_counts(per_rank))
            self._last_progress = time.monotonic()
            seen += 1
            logger.debug(f"packer: step {batch.step} -> {len(per_rank)} ranks x {len(per_rank[0])} rows")
            if max_batches is not None and seen >= max_batches:
                break
        self._stop.set()

    def stop(self) -> None:
        self._stop.set()
