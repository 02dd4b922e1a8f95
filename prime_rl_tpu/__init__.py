"""prime-rl-tpu: TPU-native asynchronous RL post-training framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
PrimeIntellect-ai/prime-rl (reference layer map in SURVEY.md): an on-device
actor-learner with a jitted sampling engine, a staleness-controlled
asyncio orchestrator, and a mesh-sharded GRPO/SFT learner.
"""

__version__ = "0.1.0"
