"""Weight-plane FAULT INJECTION (VERDICT r4 next-round #7): every injected
fault must end in recovery or loud death — never a torn pytree, never a hang.

Reference bar: the NIXL rendezvous/status machine the reference spent its
debugging budget on (reference: trainer/rl/broadcast/nixl/model_express.py:114,
nixl.py:1-60). Faults covered here:

- writer crashes between seqlock bumps (odd seq left in a header)
- reader's consume crashes mid-read (no writer-side state to corrupt)
- version rolled backwards by a restarted writer
- late dcn reader racing the writer's stale-drain (ADVICE r4 #1)
- dcn reader crashes post-claim (bounded single-registration leak)
- two dcn claimants racing one slot
- zmq reader pulling from a dead writer (timeout, not a hang)
"""

import struct

import numpy as np
import pytest

from prime_rl_tpu.transport.weights import (
    _HDR_FMT,
    ShmWeightReader,
    ShmWeightWriter,
    WeightLayout,
    ZmqStreamReader,
    flatten_params,
    shm_name_for,
    unflatten_params,
)
from tests.unit.utils.test_weight_plane import (
    _FakeServer,
    assert_params_equal,
    fake_transfer,  # noqa: F401  (fixture)
    make_params,
)


# -- shm seqlock faults ------------------------------------------------------


def _corrupt_hdr_odd(writer: ShmWeightWriter, i: int, version: int) -> None:
    """Simulate a writer killed between the two seqlock bumps: the buffer
    header holds an ODD seq (write-in-progress) forever."""
    off = writer._hdr_off[i]
    writer.shm.buf[off : off + struct.calcsize(_HDR_FMT)] = struct.pack(
        _HDR_FMT, version, writer._seq[i] + 1)


def test_writer_crash_mid_publish_leaves_prior_version_readable(tmp_path):
    p0, p1 = make_params(0), make_params(1)
    name = shm_name_for(str(tmp_path) + "crash")
    writer = ShmWeightWriter(name, WeightLayout.from_params(p0))
    try:
        writer.publish(flatten_params(p0), version=0)
        reader = ShmWeightReader(name)
        # writer starts v1 into the OTHER buffer and dies mid-write: odd seq,
        # half-written payload
        i = writer._next
        _corrupt_hdr_odd(writer, i, version=1)
        writer._buf_views[i]["embed"][:4] = np.asarray(
            flatten_params(p1)["embed"][:4])

        # the in-progress buffer is invisible: latest is still v0, and a read
        # returns the COMPLETE v0 payload
        assert reader.latest_version() == 0
        got = {}
        version, ok = reader.read(-1, lambda v: got.update(
            {k: np.array(v_, copy=True) for k, v_ in v.items()}))
        assert ok and version == 0
        assert_params_equal(p0, unflatten_params(got))
        reader.close()
    finally:
        writer.close()


def test_reader_consume_crash_does_not_poison_the_plane(tmp_path):
    """A reader dying mid-read holds no locks: the writer keeps publishing
    and a fresh reader sees the newest stable version."""
    p = make_params()
    name = shm_name_for(str(tmp_path) + "rcrash")
    writer = ShmWeightWriter(name, WeightLayout.from_params(p))
    try:
        writer.publish(flatten_params(p), version=0)
        reader = ShmWeightReader(name)

        def dying_consume(views):
            raise MemoryError("reader OOM mid-copy")

        with pytest.raises(MemoryError):
            reader.read(-1, dying_consume)
        # writer unaffected
        p2 = make_params(7)
        writer.publish(flatten_params(p2), version=1)
        got = {}
        version, ok = reader.read(-1, lambda v: got.update(
            {k: np.array(v_, copy=True) for k, v_ in v.items()}))
        assert ok and version == 1
        assert_params_equal(p2, unflatten_params(got))
        reader.close()
    finally:
        writer.close()


def test_version_rollback_never_regresses_a_reader(tmp_path):
    """A restarted writer re-publishing an OLDER version (rollback) must not
    hand a tracking reader stale weights: read(newer_than=N) only ever moves
    forward. A fresh reader (no history) may adopt the rolled-back version —
    that is the resume semantics."""
    p = make_params()
    name = shm_name_for(str(tmp_path) + "rb")
    writer = ShmWeightWriter(name, WeightLayout.from_params(p))
    try:
        writer.publish(flatten_params(p), version=5)
        reader = ShmWeightReader(name)
        v, ok = reader.read(-1, lambda views: None)
        assert ok and v == 5
        # rollback: the writer (restarted from an old ckpt) publishes v2
        writer.publish(flatten_params(make_params(2)), version=2)
        v, ok = reader.read(5, lambda views: None)
        assert not ok  # tracking reader refuses to regress
        # fresh reader adopts the newest stable version present (which may be
        # the rolled-back one after the other buffer is overwritten)
        writer.publish(flatten_params(make_params(3)), version=3)
        fresh = ShmWeightReader(name)
        assert fresh.latest_version() == 3
        fresh.close()
        reader.close()
    finally:
        writer.close()


# -- dcn_pull claim/drain faults --------------------------------------------


def _dcn_writer(tmp_path, num_pullers=2):
    import jax.numpy as jnp

    from prime_rl_tpu.transport.weights import DcnPullWriter

    named = {"w": jnp.ones((4, 4), jnp.float32)}
    w = DcnPullWriter(str(tmp_path), num_pullers=num_pullers)
    return w, named


def test_late_reader_vs_stale_drain_raises_not_hangs(tmp_path, fake_transfer):  # noqa: F811
    """ADVICE r4 #1: a reader that read latest_version=v just before the
    writer published v+2 used to claim a freshly-unlinked slot and pull a
    CONSUMED registration — blocking forever. The per-slot tombstone makes
    that claim raise into the retry path instead."""
    from prime_rl_tpu.transport.weights import DcnPullReader

    w, named = _dcn_writer(tmp_path)
    w.publish(named, version=1)
    reader = DcnPullReader(str(tmp_path))
    assert reader.latest_version() == 1
    # ... reader is descheduled; writer advances two versions and drains v1
    w.publish(named, version=2)
    w.publish(named, version=3)
    assert 1 not in w._live
    # claim files for v1 were unlinked — the old code would claim and hang
    assert not list((tmp_path / "weight_plane").glob("claim_1_*"))
    with pytest.raises(RuntimeError, match="drained"):
        reader.pull(1)
    # retry path works: the fresh marker pulls fine
    assert reader.pull(reader.latest_version())["w"].shape == (4, 4)


def test_reader_crash_post_claim_leaks_one_registration_only(tmp_path, fake_transfer):  # noqa: F811
    """A reader that claims a slot then dies leaks exactly that one
    registration (documented residual risk); the writer skips it during the
    stale-drain and every later publish keeps working."""
    from prime_rl_tpu.transport.weights import _DCN_SLOT_STRIDE, _claim_slot

    w, named = _dcn_writer(tmp_path)
    addr = w.address
    w.publish(named, version=1)
    # reader claims slot 0 of v1 and crashes before pulling
    assert _claim_slot(tmp_path / "weight_plane", 1, 0)
    w.publish(named, version=2)
    w.publish(named, version=3)  # drains v1
    # slot 0: claim honored (registration leaked, claim file kept);
    # slot 1: drained + tombstoned
    assert (addr, 1 * _DCN_SLOT_STRIDE) in _FakeServer.MAILBOX
    assert (addr, 1 * _DCN_SLOT_STRIDE + 1) not in _FakeServer.MAILBOX
    assert (tmp_path / "weight_plane" / "claim_1_0").exists()
    assert (tmp_path / "weight_plane" / "drained_1_1").exists()
    # the plane still serves new versions
    from prime_rl_tpu.transport.weights import DcnPullReader

    r = DcnPullReader(str(tmp_path))
    assert r.pull(3)["w"].shape == (4, 4)


def test_two_claimants_race_one_slot(tmp_path, fake_transfer):  # noqa: F811
    """Exactly one of two racing claimants wins each slot; the loser of the
    LAST slot gets a loud RuntimeError, never a double pull."""
    from prime_rl_tpu.transport.weights import DcnPullReader

    w, named = _dcn_writer(tmp_path, num_pullers=1)
    w.publish(named, version=1)
    r1 = DcnPullReader(str(tmp_path))
    r2 = DcnPullReader(str(tmp_path))
    assert r1.pull(1)["w"].shape == (4, 4)
    with pytest.raises(RuntimeError, match="no free slot"):
        r2.pull(1)


# -- zmq dead-writer fault ---------------------------------------------------


def test_zmq_pull_from_dead_writer_times_out():
    pytest.importorskip("zmq")
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()  # nobody listening here
    reader = ZmqStreamReader("127.0.0.1", port, port)
    assert reader.pull_latest(timeout_ms=300) is None  # timeout, not a hang
    reader.close()
