"""The disaggregated weight plane: per-step policy weights move from the
learner process to sampler processes WITHOUT a disk round-trip.

TPU-native replacement for the reference's NCCL/NIXL broadcast stack
(reference: trainer/rl/broadcast/nccl.py:197-267 layerwise streaming,
broadcast/nixl/ RDMA, inference/vllm/worker/nccl.py:1-158). On TPU hosts the
learner and sampler processes either share a host (one pod slice per role on
the same machine, or CPU-mesh tests) or sit across DCN:

- **shm**: a double-buffered POSIX shared-memory arena. The writer
  device-gets the param pytree into the inactive buffer under a seqlock and
  bumps the buffer header; readers poll the 16-byte headers (no message
  channel → no lost-announce races, late joiners see the latest stable
  buffer immediately). One host-RAM copy each way; nothing touches disk.
- **zmq_stream**: layerwise tensor streaming over ZMQ (TCP/DCN). The writer
  PUBs one multipart message per publish (header JSON + one frame per
  tensor, raw bytes) and serves the latest publish over a REP socket so
  joiners can pull without waiting for the next step.

Both modes carry the same ``WeightLayout`` manifest (flattened param paths,
dtypes, shapes) so the receiver can rebuild the exact nested Params pytree.

Wire invariant: a publish is atomic — a reader either sees the complete new
version or keeps the old one; torn reads are detected via the seqlock and
dropped.
"""

from __future__ import annotations

import hashlib
import json
import struct
import threading
from dataclasses import dataclass
from multiprocessing import shared_memory

import numpy as np

_MAGIC = b"PRLW0001"
_HDR_FMT = "<QQ"  # version (u64), seq (u64) — odd seq = write in progress
_HDR_SIZE = struct.calcsize(_HDR_FMT)
_LAYOUT_CAP = 1 << 20  # 1 MiB JSON manifest region


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        # bfloat16 / float8_* wire dtypes live in ml_dtypes
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def _dtype_name(dt) -> str:
    return str(np.dtype(dt))


@dataclass
class TensorSpec:
    path: str
    dtype: str
    shape: tuple[int, ...]
    offset: int  # byte offset into one payload buffer

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.shape, dtype=np.int64)) * _np_dtype(self.dtype).itemsize


@dataclass
class WeightLayout:
    """Flattened manifest of a Params pytree (nested dicts of arrays)."""

    tensors: list[TensorSpec]
    payload_bytes: int

    @classmethod
    def from_params(cls, params) -> "WeightLayout":
        import jax

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        tensors, off = [], 0
        for path, leaf in flat:
            name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            spec = TensorSpec(name, _dtype_name(leaf.dtype), tuple(leaf.shape), off)
            # 128-byte align each tensor for fast copies
            off += (spec.nbytes + 127) & ~127
            tensors.append(spec)
        return cls(tensors, off)

    def to_json(self) -> str:
        return json.dumps(
            {
                "payload_bytes": self.payload_bytes,
                "tensors": [
                    [t.path, t.dtype, list(t.shape), t.offset] for t in self.tensors
                ],
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "WeightLayout":
        d = json.loads(s)
        return cls(
            [TensorSpec(p, dt, tuple(sh), off) for p, dt, sh, off in d["tensors"]],
            d["payload_bytes"],
        )

    def views(self, buf: memoryview) -> dict[str, np.ndarray]:
        """Zero-copy numpy views into one payload buffer, keyed by path."""
        out = {}
        for t in self.tensors:
            arr = np.frombuffer(
                buf, dtype=_np_dtype(t.dtype), count=int(np.prod(t.shape, dtype=np.int64)),
                offset=t.offset,
            )
            out[t.path] = arr.reshape(t.shape)
        return out


def flatten_params(params) -> dict[str, np.ndarray]:
    """Params pytree → {'/'-joined path: leaf}, matching WeightLayout paths."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path): leaf
        for path, leaf in flat
    }


def unflatten_params(named: dict[str, np.ndarray]) -> dict:
    """Rebuild the nested Params dict from '/'-joined paths."""
    root: dict = {}
    for path, arr in named.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return root


SCALE_SUFFIX = "!scale"  # companion per-tensor dequant scale entries


def dequantize_named(named: dict[str, np.ndarray],
                     target: str = "bfloat16") -> dict[str, np.ndarray]:
    """Undo quantize-in-transfer: for every ``path!scale`` companion entry,
    dequantize ``path`` (fp8 wire format) to ``target`` and drop the scale
    (reference: broadcast/nccl.py:34-68 quantize-in-transfer, received side).
    A dict with no scale entries passes through unchanged."""
    scales = {p[: -len(SCALE_SUFFIX)]: a for p, a in named.items()
              if p.endswith(SCALE_SUFFIX)}
    if not scales:
        return named
    tgt = _np_dtype(target)
    out = {}
    for p, a in named.items():
        if p.endswith(SCALE_SUFFIX):
            continue
        if p in scales:
            out[p] = (a.astype(np.float32) * np.float32(scales[p].reshape(-1)[0])).astype(tgt)
        else:
            out[p] = a
    return out


def resolve_plane_id(output_dir: str) -> str:
    """Both endpoints derive the segment name from the same id. The launcher
    sets PRIME_RL_WEIGHT_PLANE_ID to a per-run nonce so a reader can never
    attach to a stale segment left by a crashed earlier run."""
    import os

    return os.environ.get("PRIME_RL_WEIGHT_PLANE_ID") or str(output_dir)


def shm_name_for(plane_id: str) -> str:
    return "prlw_" + hashlib.sha1(str(plane_id).encode()).hexdigest()[:12]


class ShmWeightWriter:
    """Learner side of the shm plane. Owns the segment; double-buffered."""

    def __init__(self, name: str, layout: WeightLayout):
        self.layout = layout
        self._payload0 = len(_MAGIC) + 8 + _LAYOUT_CAP + 2 * _HDR_SIZE
        total = self._payload0 + 2 * layout.payload_bytes
        manifest = layout.to_json().encode()
        if len(manifest) > _LAYOUT_CAP:
            raise ValueError("weight layout manifest exceeds 1 MiB")
        try:  # a stale segment from a crashed run: replace it
            shared_memory.SharedMemory(name=name).unlink()
        except FileNotFoundError:
            pass
        self.shm = shared_memory.SharedMemory(name=name, create=True, size=total)
        mv = self.shm.buf
        mv[: len(_MAGIC)] = _MAGIC
        mv[len(_MAGIC) : len(_MAGIC) + 8] = struct.pack("<Q", len(manifest))
        mv[len(_MAGIC) + 8 : len(_MAGIC) + 8 + len(manifest)] = manifest
        self._hdr_off = [len(_MAGIC) + 8 + _LAYOUT_CAP + i * _HDR_SIZE for i in range(2)]
        for off in self._hdr_off:
            mv[off : off + _HDR_SIZE] = struct.pack(_HDR_FMT, 0, 0)
        self._buf_views = [
            self.layout.views(mv[self._payload0 + i * layout.payload_bytes :
                                 self._payload0 + (i + 1) * layout.payload_bytes])
            for i in range(2)
        ]
        self._seq = [0, 0]
        self._next = 0

    def publish(self, named_arrays: dict[str, np.ndarray], version: int) -> None:
        i = self._next
        self._next = 1 - i
        self._seq[i] += 1  # odd: writing
        self._write_hdr(i, version, self._seq[i])
        views = self._buf_views[i]
        for path, arr in named_arrays.items():
            np.copyto(views[path], arr, casting="same_kind")
        self._seq[i] += 1  # even: stable
        self._write_hdr(i, version, self._seq[i])

    def _write_hdr(self, i: int, version: int, seq: int) -> None:
        off = self._hdr_off[i]
        self.shm.buf[off : off + _HDR_SIZE] = struct.pack(_HDR_FMT, version, seq)

    def close(self) -> None:
        self._buf_views = None  # drop memoryview exports before closing
        self.shm.close()
        try:
            self.shm.unlink()
        except FileNotFoundError:
            pass


class ShmWeightReader:
    """Sampler side: attach to the segment and poll for new stable versions."""

    def __init__(self, name: str):
        self.shm = shared_memory.SharedMemory(name=name)
        mv = self.shm.buf
        if bytes(mv[: len(_MAGIC)]) != _MAGIC:
            raise ValueError(f"shm segment {name} has no weight-plane magic")
        (mlen,) = struct.unpack("<Q", mv[len(_MAGIC) : len(_MAGIC) + 8])
        self.layout = WeightLayout.from_json(
            bytes(mv[len(_MAGIC) + 8 : len(_MAGIC) + 8 + mlen]).decode()
        )
        self._hdr_off = [len(_MAGIC) + 8 + _LAYOUT_CAP + i * _HDR_SIZE for i in range(2)]
        self._payload0 = len(_MAGIC) + 8 + _LAYOUT_CAP + 2 * _HDR_SIZE
        self._buf_views = [
            self.layout.views(mv[self._payload0 + i * self.layout.payload_bytes :
                                 self._payload0 + (i + 1) * self.layout.payload_bytes])
            for i in range(2)
        ]

    def _read_hdr(self, i: int) -> tuple[int, int]:
        off = self._hdr_off[i]
        return struct.unpack(_HDR_FMT, bytes(self.shm.buf[off : off + _HDR_SIZE]))

    def latest_version(self) -> int:
        best = -1
        for i in range(2):
            version, seq = self._read_hdr(i)
            if seq > 0 and seq % 2 == 0:
                best = max(best, version)
        return best

    def read(self, newer_than: int, consume) -> tuple[int, bool]:
        """If a stable buffer holds a version > ``newer_than``, call
        ``consume(named_views)`` on its zero-copy views and seqlock-validate
        afterwards. Returns (version, ok). ``consume`` must finish its copies
        before returning (e.g. block on the device transfer)."""
        best_i, best_v, best_seq = -1, newer_than, -1
        for i in range(2):
            version, seq = self._read_hdr(i)
            if seq % 2 == 0 and seq > 0 and version > best_v:
                best_i, best_v, best_seq = i, version, seq
        if best_i < 0:
            return newer_than, False
        consume(self._buf_views[best_i])
        version, seq = self._read_hdr(best_i)
        if (version, seq) != (best_v, best_seq):
            return newer_than, False  # torn read: writer lapped us; retry later
        return best_v, True

    def close(self) -> None:
        self._buf_views = None
        self.shm.close()


class ZmqStreamWriter:
    """Cross-host tensor streaming: PUB pushes each publish as one multipart
    message (manifest + raw tensor frames); a REP socket serves the latest
    publish to late joiners (reference: broadcast/nccl.py layerwise streaming,
    re-expressed over DCN sockets)."""

    def __init__(self, pub_port: int, rep_port: int, host: str = "*"):
        import zmq

        self.ctx = zmq.Context.instance()
        self.pub = self.ctx.socket(zmq.PUB)
        self.pub.bind(f"tcp://{host}:{pub_port}")
        self.rep = self.ctx.socket(zmq.REP)
        self.rep.bind(f"tcp://{host}:{rep_port}")
        self._latest: list[bytes] | None = None
        self._lock = threading.Lock()
        self._stop = False
        self._rep_thread = threading.Thread(target=self._serve_latest, daemon=True)
        self._rep_thread.start()

    def publish(self, named_arrays: dict[str, np.ndarray], version: int) -> None:
        header = json.dumps(
            {
                "version": version,
                "tensors": [
                    [p, _dtype_name(a.dtype), list(a.shape)]
                    for p, a in named_arrays.items()
                ],
            }
        ).encode()
        frames = [header] + [np.ascontiguousarray(a).tobytes() for a in named_arrays.values()]
        with self._lock:
            self._latest = frames
        self.pub.send_multipart(frames, copy=False)

    def _serve_latest(self) -> None:
        import zmq

        poller = zmq.Poller()
        poller.register(self.rep, zmq.POLLIN)
        while not self._stop:
            try:
                if not dict(poller.poll(timeout=100)):
                    continue
                self.rep.recv()
                with self._lock:
                    frames = self._latest
                if frames is None:
                    self.rep.send_multipart([b"{}"])
                else:
                    self.rep.send_multipart(frames, copy=False)
            except zmq.ZMQError:
                break

    def close(self) -> None:
        self._stop = True
        self._rep_thread.join(timeout=1.0)
        self.pub.close(0)
        self.rep.close(0)


class ZmqStreamReader:
    """SUB for pushes + REQ pull of the latest publish on attach."""

    def __init__(self, host: str, pub_port: int, rep_port: int):
        import zmq

        self.ctx = zmq.Context.instance()
        self.sub = self.ctx.socket(zmq.SUB)
        self.sub.connect(f"tcp://{host}:{pub_port}")
        self.sub.setsockopt(zmq.SUBSCRIBE, b"")
        self._rep_addr = f"tcp://{host}:{rep_port}"

    @staticmethod
    def _decode(frames: list[bytes]) -> tuple[int, dict[str, np.ndarray]] | None:
        header = json.loads(frames[0])
        if "version" not in header:
            return None
        named = {}
        for (path, dtype, shape), raw in zip(header["tensors"], frames[1:]):
            named[path] = np.frombuffer(raw, dtype=_np_dtype(dtype)).reshape(shape)
        return int(header["version"]), named

    def pull_latest(self, timeout_ms: int = 2000):
        import zmq

        req = self.ctx.socket(zmq.REQ)
        req.setsockopt(zmq.LINGER, 0)
        req.connect(self._rep_addr)
        try:
            req.send(b"latest")
            if not req.poll(timeout_ms):
                return None
            return self._decode(req.recv_multipart())
        finally:
            req.close(0)

    def poll(self, timeout_ms: int = 100):
        """Non-blocking receive of the newest pushed publish (drains backlog)."""
        import zmq

        newest = None
        while self.sub.poll(timeout_ms if newest is None else 0):
            newest = self.sub.recv_multipart()
        return self._decode(newest) if newest else None

    def close(self) -> None:
        self.sub.close(0)


# ---------------------------------------------------------------------------
# dcn_pull: one-sided device-to-device pulls via jax.experimental.transfer —
# the direct analogue of the reference's NIXL RDMA reads (broadcast/nixl/
# one-sided reads from typed staging arenas + ModelExpress rendezvous). The
# learner queues each published version's DEVICE arrays on a transfer server
# (no host staging at all); each sampler pulls them straight into its own
# device memory over DCN/ICI. The rendezvous side-channel is a tiny JSON
# manifest + version marker on the shared filesystem (the STABLE-marker
# idiom), replacing ModelExpress gRPC.
#
# Requires a PJRT runtime with premapped-buffer transfer support (real
# multi-host TPU pods). Single-process CPU builds and remote-tunnel plugins
# (axon) do not implement it — config-gated, never auto-selected.
# ---------------------------------------------------------------------------

_DCN_MANIFEST = "dcn_plane.json"
_DCN_VERSION = "dcn_version"
# uuid = version * _DCN_SLOT_STRIDE + slot: one registration per (version,
# puller-slot), so un-pulled registrations of a stale version can be drained
# individually (jax.experimental.transfer has no cancel API).
_DCN_SLOT_STRIDE = 4096


def _dcn_dir(output_dir: str):
    import pathlib

    d = pathlib.Path(output_dir) / "weight_plane"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _routable_ip() -> str:
    """Best-effort routable address of this host (UDP-connect trick — no
    packets are sent). Used when the transfer server binds a wildcard."""
    import socket

    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        s.connect(("8.8.8.8", 80))
        return s.getsockname()[0]
    except OSError:
        return "127.0.0.1"
    finally:
        s.close()


def _write_tombstone(plane_dir, version: int, slot: int) -> None:
    """Mark (version, slot) as drained by the writer (registration consumed)."""
    try:
        (plane_dir / f"drained_{version}_{slot}").touch()
    except OSError:
        pass


def _is_drained(plane_dir, version: int, slot: int) -> bool:
    return (plane_dir / f"drained_{version}_{slot}").exists()


def _claim_slot(plane_dir, version: int, slot: int) -> bool:
    """Atomically claim (version, slot). Exactly one process — a reader
    about to pull, or the writer about to drain — wins each slot."""
    import os

    try:
        fd = os.open(plane_dir / f"claim_{version}_{slot}",
                     os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
        return True
    except FileExistsError:
        return False


class DcnPullWriter:
    """Learner side: queue each version's device arrays for one-sided pulls.

    Registration protocol: each publish registers ``num_pullers`` pulls, one
    per (version, slot) uuid. A reader atomically claims a slot file before
    pulling; at publish of version N the writer reclaims every unclaimed slot
    of versions ≤ N-2 and drains it by pulling from itself, releasing the
    device buffers the transfer server pins per registration (the API has no
    cancel). Arrays of the last two versions are kept alive host-side like
    the shm arena's double buffer.
    """

    def __init__(self, output_dir: str, num_pullers: int = 1,
                 advertise_ip: str | None = None):
        import jax
        from jax.experimental import transfer

        self._dir = _dcn_dir(output_dir)
        client = jax.devices()[0].client
        self._server = transfer.start_transfer_server(client)
        addr = self._server.address()
        # a wildcard bind is unreachable from other hosts: advertise a real IP
        # (ADVICE r3: the reader used to patch "[::]" to loopback, which broke
        # cross-host pulls — the writer owns the rewrite now)
        ip = advertise_ip or _routable_ip()
        for wild in ("[::]", "0.0.0.0", "::"):
            if wild in addr:
                addr = addr.replace(wild, ip)
                break
        self.address = addr
        self._num_pullers = max(1, num_pullers)
        self._live: dict[int, list] = {}   # version -> arrays kept alive
        self._self_conn = None
        self._layout_written = False

    def publish(self, named_dev: dict, version: int) -> None:
        """``named_dev``: flat path -> DEVICE jax.Array (quantize-in-transfer
        upstream, exactly like the host planes)."""
        import json
        import os

        paths = sorted(named_dev)
        arrays = [named_dev[p] for p in paths]
        if not self._layout_written:
            manifest = {
                "address": self.address,
                "num_pullers": self._num_pullers,
                "tensors": [
                    {"path": p, "dtype": _dtype_name(named_dev[p].dtype),
                     "shape": list(named_dev[p].shape)}
                    for p in paths
                ],
            }
            tmp = self._dir / (_DCN_MANIFEST + ".tmp")
            tmp.write_text(json.dumps(manifest))
            os.replace(tmp, self._dir / _DCN_MANIFEST)
            self._layout_written = True
        for slot in range(self._num_pullers):
            self._server.await_pull(version * _DCN_SLOT_STRIDE + slot, arrays)
        self._live[version] = arrays
        tmp = self._dir / (_DCN_VERSION + ".tmp")
        tmp.write_text(str(version))
        os.replace(tmp, self._dir / _DCN_VERSION)
        self._expire_stale(version)

    def _expire_stale(self, current: int) -> None:
        """Release registrations of versions at least two behind ``current``.

        Readers always pull the latest marker, so anything two markers old
        can only be an un-pulled leftover from a lagging/over-provisioned
        fleet. Slots a reader already claimed are its responsibility (it is
        mid-pull or crashed post-claim — the latter leaks one registration,
        the documented residual risk)."""
        import jax

        for v in [v for v in self._live if v <= current - 2]:
            arrays = self._live.pop(v)
            specs = [jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding)
                     for a in arrays]
            for slot in range(self._num_pullers):
                if _claim_slot(self._dir, v, slot):
                    if self._self_conn is None:
                        self._self_conn = self._server.connect(
                            self._server.address())
                    self._self_conn.pull(v * _DCN_SLOT_STRIDE + slot, specs)
                    # Tombstone BEFORE unlinking the claim file: a late reader
                    # that read latest_version==v just before this drain could
                    # otherwise claim the freshly-unlinked slot and pull a
                    # consumed registration — which blocks forever (the
                    # transfer API has no pull timeout). With the tombstone
                    # persisted first, any claim that succeeds post-unlink
                    # necessarily observes it and raises into the retry path.
                    # Slots a reader claimed first are left alone (claim file
                    # kept, registration live, its pull completes normally).
                    # Tombstones are empty files kept for the run's lifetime.
                    _write_tombstone(self._dir, v, slot)
                    try:
                        (self._dir / f"claim_{v}_{slot}").unlink()
                    except OSError:
                        pass

    def close(self) -> None:
        self._live = {}


class DcnPullReader:
    """Sampler side: poll the version marker, claim a slot, pull to device."""

    def __init__(self, output_dir: str, sharding=None):
        import json
        import time as _t

        self._dir = _dcn_dir(output_dir)
        man = self._dir / _DCN_MANIFEST
        while not man.exists():
            _t.sleep(0.2)
        self._manifest = json.loads(man.read_text())
        self._paths = [t["path"] for t in self._manifest["tensors"]]
        self._num_slots = int(self._manifest.get("num_pullers", 1))
        self._specs = None
        self._sharding = sharding
        self._conn = None

    def latest_version(self) -> int:
        try:
            return int((self._dir / _DCN_VERSION).read_text())
        except (FileNotFoundError, ValueError):
            return -1

    def _connect(self):
        import jax
        from jax.experimental import transfer

        if self._conn is None:
            client = jax.devices()[0].client
            self._server = transfer.start_transfer_server(client)
            self._conn = self._server.connect(self._manifest["address"])
        if self._specs is None:
            import jax

            sh = self._sharding or jax.sharding.SingleDeviceSharding(jax.devices()[0])
            self._specs = [
                jax.ShapeDtypeStruct(tuple(t["shape"]), _np_dtype(t["dtype"]),
                                     sharding=sh)
                for t in self._manifest["tensors"]
            ]
        return self._conn

    def pull(self, version: int) -> dict:
        """One-sided pull of ``version``'s arrays onto this process's
        devices. Returns flat path -> device jax.Array (scales included —
        dequantize with ``dequantize_named_device``). Raises ``RuntimeError``
        if every slot of ``version`` is already taken (another reader or the
        writer's stale-drain won the claim) — re-read ``latest_version()``
        and retry with the fresher marker."""
        conn = self._connect()
        for slot in range(self._num_slots):
            if _claim_slot(self._dir, version, slot):
                # Check AFTER claiming: the writer tombstones a slot before it
                # unlinks that slot's claim file, so a claim that raced the
                # stale-drain (and would pull a consumed registration, hanging
                # forever) is guaranteed to see the tombstone here. A slot we
                # claimed before the writer's drain attempt has no tombstone
                # and its registration is live — pull proceeds normally.
                if _is_drained(self._dir, version, slot):
                    raise RuntimeError(
                        f"dcn_pull: version {version} slot {slot} was drained "
                        f"by the writer — stale marker, retry latest_version()")
                arrays = conn.pull(version * _DCN_SLOT_STRIDE + slot,
                                   self._specs)
                return dict(zip(self._paths, arrays))
        raise RuntimeError(
            f"dcn_pull: no free slot for version {version} "
            f"({self._num_slots} slots) — stale marker, retry latest_version()")


def dequantize_named_device(named: dict, target: str = "bfloat16") -> dict:
    """Device-side twin of ``dequantize_named`` for pulled jax arrays."""
    import jax.numpy as jnp

    scales = {p[: -len(SCALE_SUFFIX)]: a for p, a in named.items()
              if p.endswith(SCALE_SUFFIX)}
    if not scales:
        return named
    tgt = jnp.dtype(_np_dtype(target))
    out = {}
    for p, a in named.items():
        if p.endswith(SCALE_SUFFIX):
            continue
        if p in scales:
            out[p] = (a.astype(jnp.float32) * scales[p].reshape(-1)[0]).astype(tgt)
        else:
            out[p] = a
    return out
