"""Wire-type roundtrips + ZMQ/filesystem transports."""

import numpy as np
import pytest

from prime_rl_tpu.transport.types import MicroBatch, TrainingBatch, TrainingSample, decode, encode


def make_sample(n=16, env="reverse_text"):
    rng = np.random.default_rng(0)
    return TrainingSample(
        token_ids=rng.integers(0, 1000, n),
        mask=rng.random(n) > 0.5,
        logprobs=rng.normal(size=n),
        temperatures=np.full(n, 1.0),
        env_name=env,
        advantages=rng.normal(size=n),
    )


def test_sample_roundtrip():
    batch = TrainingBatch(examples=[make_sample(), make_sample(8)], step=3)
    out = decode(encode(batch))
    assert isinstance(out, TrainingBatch)
    assert out.step == 3
    assert len(out.examples) == 2
    np.testing.assert_array_equal(out.examples[0].token_ids, batch.examples[0].token_ids)
    np.testing.assert_allclose(out.examples[0].logprobs, batch.examples[0].logprobs, rtol=1e-6)
    assert out.examples[0].token_ids.dtype == np.int32
    assert out.examples[1].ref_logprobs is None


def test_length_mismatch_rejected():
    with pytest.raises(ValueError):
        TrainingSample(token_ids=[1, 2, 3], mask=[True], logprobs=[0.0, 0.0, 0.0], temperatures=[1.0] * 3)


def test_micro_batch_roundtrip():
    n = 32
    mb = MicroBatch(
        input_ids=np.arange(n),
        loss_mask=np.ones(n, bool),
        advantages=np.zeros(n),
        inference_logprobs=np.zeros(n),
        position_ids=np.arange(n),
        temperatures=np.ones(n),
        seq_lens=[16, 16],
        env_names=["a", "b"],
    )
    out = decode(encode([mb]))
    assert isinstance(out, list) and isinstance(out[0], MicroBatch)
    assert out[0].seq_lens == [16, 16]


def test_zmq_training_batch(free_port):
    from prime_rl_tpu.transport.zmq import ZMQTrainingBatchReceiver, ZMQTrainingBatchSender

    port = free_port()
    recv = ZMQTrainingBatchReceiver("127.0.0.1", port)
    send = ZMQTrainingBatchSender("127.0.0.1", port)
    batch = TrainingBatch(examples=[make_sample()], step=0)
    send.send(batch)
    out = recv.receive(timeout=5)
    assert out is not None and out.step == 0
    send.close()
    recv.close()


def test_zmq_micro_batch_pubsub(free_port):
    from prime_rl_tpu.transport.zmq import ZMQMicroBatchReceiver, ZMQMicroBatchSender

    port = free_port()
    send = ZMQMicroBatchSender("127.0.0.1", port, num_ranks=2)
    r0 = ZMQMicroBatchReceiver("127.0.0.1", port, rank=0)
    r1 = ZMQMicroBatchReceiver("127.0.0.1", port, rank=1)
    mb = MicroBatch(
        input_ids=np.arange(4),
        loss_mask=np.ones(4, bool),
        advantages=np.zeros(4),
        inference_logprobs=np.zeros(4),
        position_ids=np.arange(4),
        temperatures=np.ones(4),
        seq_lens=[4],
    )
    send.send(7, [[mb], [mb, mb]], counts={"rl": 6})
    step0, mbs0, counts0 = r0.receive(timeout=5)
    step1, mbs1, counts1 = r1.receive(timeout=5)
    assert step0 == step1 == 7
    assert len(mbs0) == 1 and len(mbs1) == 2
    assert counts0 == counts1 == {"rl": 6}
    for s in (send, r0, r1):
        s.close()


def test_filesystem_transport(output_dir):
    from prime_rl_tpu.transport.filesystem import (
        FSTrainingBatchReceiver,
        FSTrainingBatchSender,
    )

    send = FSTrainingBatchSender(output_dir)
    recv = FSTrainingBatchReceiver(output_dir)
    send.send(TrainingBatch(examples=[make_sample()], step=0))
    out = recv.receive(timeout=5)
    assert out.step == 0
    assert recv.receive(timeout=0.1) is None
