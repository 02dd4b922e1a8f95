"""Sampler-side endpoint of the disaggregated weight plane
(reference: inference/vllm/worker/nccl.py:1-158 — the vLLM worker's NCCL
receive loop, re-expressed over the TPU-native planes in
transport/weights.py).

A daemon thread polls the configured plane; each new stable version is
applied with the same drain-safe ordering as the HTTP ``/update_weights``
route: pause → update_params (drains in-flight steps) → resume. The
orchestrator observes the bump through ``/liveness`` (watch="liveness"),
so the whole watcher protocol is unchanged — only the transport is.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from prime_rl_tpu.utils.logger import get_logger


class WeightPlaneReceiver(threading.Thread):
    def __init__(self, config, plane_id: str, engine, poll_interval: float = 0.05,
                 output_dir: str | None = None):
        super().__init__(daemon=True, name="weight-plane-receiver")
        self.config = config
        self.plane_id = plane_id
        self.engine = engine
        self.output_dir = output_dir
        self.poll_interval = poll_interval
        self._stop = threading.Event()
        self.version = int(getattr(engine, "policy_version", -1))
        self.last_apply_s = 0.0
        self.applied = 0

    def stop(self) -> None:
        self._stop.set()

    # -- shm ------------------------------------------------------------

    def _attach_shm(self):
        from prime_rl_tpu.transport.weights import ShmWeightReader, shm_name_for

        name = shm_name_for(self.plane_id)
        while not self._stop.is_set():
            try:
                return ShmWeightReader(name)
            except (FileNotFoundError, ValueError):
                time.sleep(0.2)
        return None

    def _run_shm(self) -> None:
        logger = get_logger()
        reader = self._attach_shm()
        if reader is None:
            return
        logger.info(f"weight plane: attached shm arena ({len(reader.layout.tensors)} tensors)")
        while not self._stop.is_set():
            host: dict[str, np.ndarray] = {}

            def consume(views):
                # copy out before seqlock validation (torn reads discarded)
                for p, v in views.items():
                    host[p] = np.array(v, copy=True)

            version, ok = reader.read(self.version, consume)
            if ok:
                self._apply(host, version)
            else:
                time.sleep(self.poll_interval)
        reader.close()

    # -- zmq stream -------------------------------------------------------

    def _run_zmq(self) -> None:
        from prime_rl_tpu.transport.weights import ZmqStreamReader

        logger = get_logger()
        reader = ZmqStreamReader(self.config.host, self.config.pub_port, self.config.rep_port)
        logger.info(f"weight plane: subscribed to {self.config.host}:{self.config.pub_port}")
        # late-joiner pull: grab whatever the trainer last published
        while not self._stop.is_set():
            got = reader.pull_latest(timeout_ms=1000)
            if got is not None:
                version, named = got
                if version > self.version:
                    self._apply(named, version)
                break
        while not self._stop.is_set():
            got = reader.poll(timeout_ms=int(self.poll_interval * 1000))
            if got is not None and got[0] > self.version:
                self._apply(*got)
        reader.close()

    # -- dcn_pull -----------------------------------------------------------

    def _run_dcn(self) -> None:
        """One-sided device pulls (reference: worker/nixl.py RDMA reads).
        The pulled arrays are already on this process's devices — apply
        dequantizes on device and swaps without any host copy."""
        from prime_rl_tpu.transport.weights import (
            DcnPullReader,
            dequantize_named_device,
            unflatten_params,
        )

        logger = get_logger()
        reader = DcnPullReader(self.output_dir)
        logger.info("weight plane: dcn_pull attached "
                    f"({len(reader._paths)} tensors from {reader._manifest['address']})")
        while not self._stop.is_set():
            v = reader.latest_version()
            if v <= self.version:
                time.sleep(self.poll_interval)
                continue
            t0 = time.time()
            try:
                named = reader.pull(v)
            except RuntimeError:
                # marker went stale between read and claim (writer drained
                # the slots) — loop re-reads latest_version and retries
                continue
            params = unflatten_params(dequantize_named_device(named))
            self.engine.pause()
            try:
                self.engine.update_params(params, version=v, donate=True)
            finally:
                self.engine.resume()
            self.version = v
            self.applied += 1
            self.last_apply_s = time.time() - t0
            logger.info(f"weight plane: pulled + applied v{v} in {self.last_apply_s:.3f}s")

    # -- apply --------------------------------------------------------------

    def _apply(self, named: dict[str, np.ndarray], version: int) -> None:
        from prime_rl_tpu.transport.weights import dequantize_named, unflatten_params

        logger = get_logger()
        t0 = time.perf_counter()
        params = unflatten_params(dequantize_named(named))
        self.engine.pause()
        try:
            self.engine.update_params(params, version=version, donate=True)
        finally:
            self.engine.resume()
        self.version = version
        self.applied += 1
        self.last_apply_s = time.perf_counter() - t0
        logger.info(f"weight plane: applied v{version} in {self.last_apply_s:.3f}s")

    def run(self) -> None:
        try:
            if self.config.mode == "shm":
                self._run_shm()
            elif self.config.mode == "dcn_pull":
                self._run_dcn()
            else:
                self._run_zmq()
        except Exception:
            get_logger().exception("weight plane receiver died")
