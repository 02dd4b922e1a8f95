"""Packer wire roundtrip + ZMQ pub/sub flow (reference: tests rl/test_packer.py)."""

import threading

import numpy as np
import pytest

from prime_rl_tpu.trainer.rl.packer import Packer, row_to_wire, wire_to_arrays
from prime_rl_tpu.trainer.batch import PackedRow, pack_rows
from prime_rl_tpu.transport.types import TrainingBatch, TrainingSample


def make_sample(n, adv=1.0):
    rng = np.random.default_rng(n)
    return TrainingSample(
        token_ids=rng.integers(1, 100, n).astype(np.int32),
        mask=np.ones(n, bool),
        logprobs=np.full(n, -1.0, np.float32),
        temperatures=np.full(n, 0.7, np.float32),
        env_name="e",
        advantages=np.full(n, adv, np.float32),
    )


def test_row_wire_roundtrip():
    rows = pack_rows([make_sample(10), make_sample(6)], seq_len=32)
    wire = row_to_wire(rows[0], 32)
    assert wire.seq_lens == [10, 6]
    arrays = wire_to_arrays([wire])
    assert arrays.input_ids.shape == (1, 1, 32)
    # segments derived from seq_lens
    seg = arrays.segment_ids[0, 0]
    assert list(seg[:10]) == [1] * 10 and list(seg[10:16]) == [2] * 6 and seg[16:].sum() == 0
    # first tokens masked
    assert not arrays.loss_mask[0, 0, 0] and not arrays.loss_mask[0, 0, 10]


def test_pack_equal_width_across_ranks():
    from prime_rl_tpu.transport.base import MicroBatchSender, TrainingBatchReceiver

    class NullR(TrainingBatchReceiver):
        def receive(self, timeout=None):
            return None

    class NullS(MicroBatchSender):
        def send(self, step, per_rank):
            pass

    p = Packer(NullR(), NullS(), seq_len=64, num_ranks=4)
    batch = TrainingBatch(examples=[make_sample(n) for n in (60, 30, 20, 10, 5)], step=0)
    per_rank = p.pack(batch)
    assert len(per_rank) == 4
    widths = {len(r) for r in per_rank}
    assert len(widths) == 1  # all-ranks-same-program invariant


def test_zmq_packer_flow(free_port):
    """TrainingBatch -> packer -> per-rank MicroBatch subscribers."""
    from prime_rl_tpu.transport.zmq import (
        ZMQMicroBatchReceiver,
        ZMQMicroBatchSender,
        ZMQTrainingBatchReceiver,
        ZMQTrainingBatchSender,
    )

    p1, p2 = free_port(), free_port()
    tb_recv = ZMQTrainingBatchReceiver("127.0.0.1", p1)
    mb_send = ZMQMicroBatchSender("127.0.0.1", p2, num_ranks=2)
    rank0 = ZMQMicroBatchReceiver("127.0.0.1", p2, rank=0)
    rank1 = ZMQMicroBatchReceiver("127.0.0.1", p2, rank=1)
    packer = Packer(tb_recv, mb_send, seq_len=64, num_ranks=2)
    t = threading.Thread(target=packer.run, kwargs={"max_batches": 1}, daemon=True)
    t.start()

    sender = ZMQTrainingBatchSender("127.0.0.1", p1, bind=False)
    import time

    time.sleep(0.3)
    sender.send(TrainingBatch(examples=[make_sample(n) for n in (40, 30, 20)], step=7))

    got0 = rank0.receive(timeout=20)
    got1 = rank1.receive(timeout=20)
    assert got0 is not None and got1 is not None
    step0, mbs0, counts0 = got0
    step1, mbs1, counts1 = got1
    assert step0 == step1 == 7
    assert len(mbs0) == len(mbs1)
    total = sum(sum(m.seq_lens) for m in mbs0 + mbs1)
    assert total == 90
    # global counts travel with every rank's feed: 90 tokens minus one
    # force-masked first token per sample
    assert counts0 == counts1 and counts0["rl"] == 90 - 3
    t.join(timeout=10)
    for s in (tb_recv, mb_send, rank0, rank1, sender):
        s.close()


def test_run_idx_survives_packing():
    """Multi-tenant routing through the multi-host path: the packer stamps
    the batch's run id on every re-binned row (reference: MultiPacker
    round-robin), so the trainer can swap to the right tenant state."""
    from prime_rl_tpu.transport.base import MicroBatchSender, TrainingBatchReceiver

    class NullR(TrainingBatchReceiver):
        def receive(self, timeout=None):
            return None

    class NullS(MicroBatchSender):
        def send(self, step, per_rank):
            pass

    p = Packer(NullR(), NullS(), seq_len=64, num_ranks=2)
    batch = TrainingBatch(examples=[make_sample(n) for n in (30, 20)],
                          step=0, run_idx=3)
    per_rank = p.pack(batch)
    for mbs in per_rank:
        for mb in mbs:
            assert mb.run_id == "run_3"
    # untagged batches stay untagged (single-tenant default)
    per_rank = p.pack(TrainingBatch(examples=[make_sample(8)], step=1))
    assert all(mb.run_id is None for mbs in per_rank for mb in mbs)
