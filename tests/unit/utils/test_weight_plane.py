"""Disaggregated weight plane tests (transport/weights.py): shm arena
roundtrip + seqlock semantics, zmq tensor streaming, pytree rebuild."""

import numpy as np
import pytest

from prime_rl_tpu.transport.weights import (
    ShmWeightReader,
    ShmWeightWriter,
    WeightLayout,
    ZmqStreamReader,
    ZmqStreamWriter,
    flatten_params,
    shm_name_for,
    unflatten_params,
)


def make_params(seed=0):
    rng = np.random.default_rng(seed)
    import ml_dtypes

    return {
        "embed": rng.normal(size=(32, 16)).astype(ml_dtypes.bfloat16),
        "layers": {
            "wq": rng.normal(size=(2, 16, 16)).astype(np.float32),
            "wk": rng.normal(size=(2, 16, 8)).astype(np.float32),
        },
        "final_norm": rng.normal(size=(16,)).astype(np.float32),
    }


def assert_params_equal(a, b):
    fa, fb = flatten_params(a), flatten_params(b)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=k)


def test_flatten_roundtrip():
    p = make_params()
    assert_params_equal(p, unflatten_params(flatten_params(p)))


def test_shm_roundtrip(tmp_path):
    p = make_params()
    name = shm_name_for(str(tmp_path))
    writer = ShmWeightWriter(name, WeightLayout.from_params(p))
    try:
        reader = ShmWeightReader(name)
        assert reader.latest_version() == -1

        writer.publish(flatten_params(p), version=0)
        got = {}
        version, ok = reader.read(-1, lambda views: got.update(
            {k: np.array(v) for k, v in views.items()}))
        assert ok and version == 0
        assert_params_equal(p, unflatten_params(got))

        # no re-read of the same version
        _, ok = reader.read(0, lambda views: None)
        assert not ok

        # double buffering: v1 lands in the other buffer; reader gets v1
        p2 = make_params(seed=1)
        writer.publish(flatten_params(p2), version=1)
        got2 = {}
        version, ok = reader.read(0, lambda views: got2.update(
            {k: np.array(v) for k, v in views.items()}))
        assert ok and version == 1
        assert_params_equal(p2, unflatten_params(got2))
        reader.close()
    finally:
        writer.close()


def test_shm_seqlock_detects_torn_read(tmp_path):
    p = make_params()
    name = shm_name_for(str(tmp_path) + "torn")
    writer = ShmWeightWriter(name, WeightLayout.from_params(p))
    try:
        writer.publish(flatten_params(p), version=0)
        writer.publish(flatten_params(p), version=1)
        reader = ShmWeightReader(name)

        def consume(views):
            # the writer laps us mid-read: v0's buffer gets overwritten by v2
            writer.publish(flatten_params(make_params(2)), version=2)
            writer.publish(flatten_params(make_params(3)), version=3)

        # reader targeted v1's buffer; writer rewrote it (v3) during consume
        version, ok = reader.read(0, consume)
        assert not ok  # torn read detected and discarded
        got = {}
        version, ok = reader.read(0, lambda views: got.update(
            {k: np.array(v) for k, v in views.items()}))
        assert ok and version == 3
        reader.close()
    finally:
        writer.close()


def test_shm_stale_segment_replaced(tmp_path):
    from multiprocessing import shared_memory

    p = make_params()
    name = shm_name_for(str(tmp_path) + "stale")
    # crashed-run segment left behind (arbitrary junk): a new writer replaces it
    stale = shared_memory.SharedMemory(name=name, create=True, size=64)
    stale.buf[:8] = b"garbage!"
    stale.close()
    w2 = ShmWeightWriter(name, WeightLayout.from_params(p))
    try:
        reader = ShmWeightReader(name)
        assert reader.latest_version() == -1  # fresh arena, not the stale one
        reader.close()
    finally:
        w2.close()


def _free_ports(n):
    import socket

    socks, ports = [], []
    for _ in range(n):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        socks.append(s)
        ports.append(s.getsockname()[1])
    for s in socks:
        s.close()
    return ports


def test_zmq_stream_roundtrip():
    pytest.importorskip("zmq")
    pub, rep = _free_ports(2)
    writer = ZmqStreamWriter(pub, rep, host="127.0.0.1")
    try:
        p = make_params()
        writer.publish(flatten_params(p), version=5)
        reader = ZmqStreamReader("127.0.0.1", pub, rep)
        # late joiner: pull the latest over REQ/REP
        got = reader.pull_latest(timeout_ms=5000)
        assert got is not None
        version, named = got
        assert version == 5
        assert_params_equal(p, unflatten_params(named))

        # push path: SUB receives the next publish
        import time

        time.sleep(0.3)  # let SUB finish connecting
        p2 = make_params(seed=9)
        writer.publish(flatten_params(p2), version=6)
        deadline = time.time() + 5
        pushed = None
        while pushed is None and time.time() < deadline:
            pushed = reader.poll(timeout_ms=200)
        assert pushed is not None and pushed[0] == 6
        assert_params_equal(p2, unflatten_params(pushed[1]))
        reader.close()
    finally:
        writer.close()


def test_fp8_quantize_in_transfer_roundtrip(tmp_path):
    """fp8 wire format: device-side quantize (per-tensor absmax scale),
    shm publish, receiver dequantize — values match within e4m3 precision
    and the payload shrinks ~2x vs bf16 (reference: broadcast/nccl.py:34-68)."""
    import jax.numpy as jnp

    from prime_rl_tpu.trainer.rl.broadcast import _to_wire
    from prime_rl_tpu.transport.weights import SCALE_SUFFIX, dequantize_named

    p_host = make_params()
    p = {k if not isinstance(v, dict) else k: v for k, v in p_host.items()}
    p = {"embed": jnp.asarray(np.asarray(p_host["embed"], np.float32)),
         "layers": {k: jnp.asarray(v) for k, v in p_host["layers"].items()},
         "final_norm": jnp.asarray(p_host["final_norm"])}

    wire = _to_wire(p, "float8_e4m3")
    assert "embed" + SCALE_SUFFIX in wire
    assert str(wire["embed"].dtype) == "float8_e4m3fn"
    assert "final_norm" + SCALE_SUFFIX not in wire  # 1-D stays native

    bf16_bytes = sum(np.asarray(v).size * 2 for v in flatten_params(p).values())
    wire_bytes = sum(np.asarray(v).nbytes for v in wire.values())
    assert wire_bytes < 0.6 * bf16_bytes

    # through the shm arena
    name = shm_name_for(str(tmp_path))
    writer = ShmWeightWriter(name, WeightLayout.from_params(wire))
    try:
        writer.publish(wire, version=3)
        reader = ShmWeightReader(name)
        host = {}
        version, ok = reader.read(-1, lambda views: host.update(
            {k: np.array(v, copy=True) for k, v in views.items()}))
        assert ok and version == 3
        deq = dequantize_named(host)
        assert SCALE_SUFFIX not in "".join(deq.keys())
        for k, v in deq.items():
            ref = np.asarray(flatten_params(p)[k], np.float32)
            np.testing.assert_allclose(np.asarray(v, np.float32), ref,
                                       rtol=0.13, atol=0.05, err_msg=k)
        reader.close()
    finally:
        writer.close()


class _FakeServer:
    """In-process stand-in for jax.experimental.transfer (whose C++ DCN
    transport needs a multi-host TPU runtime): queued pytrees move through a
    module-level mailbox keyed by (address, uuid)."""

    MAILBOX = {}
    N = 0

    def __init__(self):
        _FakeServer.N += 1
        self._addr = f"fake:{_FakeServer.N}"

    def address(self):
        return self._addr

    def await_pull(self, uuid, arrays):
        _FakeServer.MAILBOX[(self._addr, uuid)] = list(arrays)

    def connect(self, address):
        return _FakeConn(address)


class _FakeConn:
    def __init__(self, address):
        self.address = address

    def pull(self, uuid, specs):
        import jax.numpy as jnp

        # a registration serves exactly one pull (matches the C++ server:
        # pulled buffers are released) — the writer's stale-drain relies on it
        arrays = _FakeServer.MAILBOX.pop((self.address, uuid))
        assert len(arrays) == len(specs)
        for a, s in zip(arrays, specs):
            assert tuple(a.shape) == tuple(s.shape) and a.dtype == s.dtype, \
                f"manifest mismatch: {a.shape}/{a.dtype} vs {s.shape}/{s.dtype}"
        return [jnp.asarray(a) for a in arrays]


@pytest.fixture()
def fake_transfer(monkeypatch):
    import jax.experimental.transfer as xfer

    monkeypatch.setattr(xfer, "start_transfer_server",
                        lambda client: _FakeServer())
    _FakeServer.MAILBOX.clear()
    yield


def test_dcn_pull_roundtrip(tmp_path, fake_transfer):
    """Sender protocol (manifest + version markers + device arrays queued
    per version) against the receiver's poll/pull/dequantize — with the
    transfer fabric faked (the real jax.experimental.transfer backend needs
    a multi-host TPU runtime; this validates everything we own around it)."""
    import jax
    import jax.numpy as jnp

    from prime_rl_tpu.trainer.rl.broadcast import DcnPullBroadcast
    from prime_rl_tpu.transport.weights import (
        DcnPullReader,
        dequantize_named_device,
        unflatten_params,
    )

    params = {
        "embed": jnp.arange(32.0, dtype=jnp.float32).reshape(8, 4),
        "layers": {"q": jnp.ones((2, 4, 4), jnp.float32) * 0.5},
        "final_norm": jnp.ones((4,), jnp.float32),
    }
    bc = DcnPullBroadcast(str(tmp_path), transfer_dtype="bfloat16")
    bc.publish(params, version=3)

    reader = DcnPullReader(str(tmp_path))
    assert reader.latest_version() == 3
    named = reader.pull(3)
    got = unflatten_params(dequantize_named_device(named))
    assert got["embed"].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got["embed"], np.float32),
                               np.asarray(params["embed"]))
    np.testing.assert_allclose(np.asarray(got["layers"]["q"], np.float32), 0.5)

    # fp8 quantize-in-transfer: scales ride the wire, dequant on device
    bc8 = DcnPullBroadcast(str(tmp_path / "q8"), transfer_dtype="float8_e4m3")
    bc8.publish(params, version=7)
    r8 = DcnPullReader(str(tmp_path / "q8"))
    named8 = r8.pull(7)
    assert any(k.endswith("!scale") for k in named8)
    got8 = unflatten_params(dequantize_named_device(named8))
    np.testing.assert_allclose(np.asarray(got8["embed"], np.float32),
                               np.asarray(params["embed"]), rtol=0.08, atol=0.2)
    # 1-D leaves skip quantization (norms stay exact)
    np.testing.assert_allclose(np.asarray(got8["final_norm"], np.float32), 1.0)

    # version bumps: the next publish supersedes; readers see the marker
    bc.publish(jax.tree.map(lambda x: x * 2, params), version=4)
    assert reader.latest_version() == 4
    named4 = reader.pull(4)
    got4 = unflatten_params(dequantize_named_device(named4))
    np.testing.assert_allclose(np.asarray(got4["embed"], np.float32),
                               np.asarray(params["embed"]) * 2)


def test_dcn_pull_stale_drain_and_slots(tmp_path, fake_transfer):
    """Skipped versions must not pin device buffers forever: at publish of
    version N the writer self-drains every unclaimed registration of
    versions <= N-2 (there is no cancel API), and slot claims guarantee a
    registration serves exactly one puller."""
    import jax.numpy as jnp

    from prime_rl_tpu.transport.weights import (
        _DCN_SLOT_STRIDE,
        DcnPullReader,
        DcnPullWriter,
    )

    named = {"w": jnp.ones((4, 4), jnp.float32)}
    w = DcnPullWriter(str(tmp_path), num_pullers=2)
    addr = w.address
    w.publish(named, version=1)          # never pulled by anyone
    assert (addr, 1 * _DCN_SLOT_STRIDE) in _FakeServer.MAILBOX
    w.publish(named, version=2)
    # v1 still inside the two-deep ring
    assert 1 in w._live
    w.publish(named, version=3)
    # v1 expired: both slots drained from the mailbox, arrays released
    assert 1 not in w._live
    assert (addr, 1 * _DCN_SLOT_STRIDE) not in _FakeServer.MAILBOX
    assert (addr, 1 * _DCN_SLOT_STRIDE + 1) not in _FakeServer.MAILBOX
    # claim files cleaned up
    assert not list((tmp_path / "weight_plane").glob("claim_1_*"))

    # two readers each get their own slot of the live version; a third is
    # told the marker is contended/stale instead of blocking forever
    r1 = DcnPullReader(str(tmp_path))
    r2 = DcnPullReader(str(tmp_path))
    r3 = DcnPullReader(str(tmp_path))
    assert r1.pull(3)["w"].shape == (4, 4)
    assert r2.pull(3)["w"].shape == (4, 4)
    import pytest

    with pytest.raises(RuntimeError, match="no free slot"):
        r3.pull(3)

    # the advertised address never points at a wildcard bind
    assert "[::]" not in w.address and "0.0.0.0" not in w.address
