"""``python -m prime_rl_tpu.entrypoints.sft @ config.toml [--flags]``
(reference: entrypoints/sft.py — no torchrun wrapper needed: one JAX process
drives the whole mesh)."""

from __future__ import annotations

from prime_rl_tpu.configs import SFTConfig, parse_config
from prime_rl_tpu.utils.jax_env import configure_jax


def main() -> None:
    configure_jax()
    from prime_rl_tpu.trainer.sft.train import train

    train(parse_config(SFTConfig))


if __name__ == "__main__":
    main()
