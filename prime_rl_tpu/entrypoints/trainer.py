"""``python -m prime_rl_tpu.entrypoints.trainer @ config.toml`` — the RL
trainer process (reference: entrypoints/trainer.py)."""

from __future__ import annotations

from prime_rl_tpu.configs import TrainerConfig, parse_config
from prime_rl_tpu.utils.jax_env import configure_jax


def main() -> None:
    configure_jax()
    from prime_rl_tpu.trainer.rl.train import train

    train(parse_config(TrainerConfig))


if __name__ == "__main__":
    main()
