"""Test fixtures. Tests run on CPU with a virtual 8-device mesh so multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax backends initialize. Force CPU even when the
# environment preselects a TPU platform (e.g. JAX_PLATFORMS=axon, which this
# image also pins via jax config at import): unit tests are hermetic and the
# virtual 8-device mesh needs the host platform. Set PRIME_RL_TPU_TESTS=1 to
# keep the real device (tests/tpu on-device parity suite).
_ON_DEVICE = os.environ.get("PRIME_RL_TPU_TESTS") == "1"
if not _ON_DEVICE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax
import pytest

if not _ON_DEVICE:
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _reset_logger():
    yield
    from prime_rl_tpu.utils.logger import reset_logger

    reset_logger()


@pytest.fixture(autouse=True)
def _reset_ep_mesh():
    """build_mesh(expert>1) registers a process-global EP mesh that reroutes
    moe_mlp — never let it leak across tests."""
    yield
    from prime_rl_tpu.ops import moe

    moe.set_ep_mesh(None)


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
