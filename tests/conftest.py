"""Test fixtures. Tests run on CPU with a virtual 8-device mesh so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax import anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import pytest


@pytest.fixture(autouse=True)
def _reset_logger():
    yield
    from prime_rl_tpu.utils.logger import reset_logger

    reset_logger()


@pytest.fixture
def output_dir(tmp_path):
    return tmp_path / "outputs"


_port_counter = [15000 + os.getpid() % 1000]


@pytest.fixture
def free_port():
    import socket

    def _get():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    return _get
