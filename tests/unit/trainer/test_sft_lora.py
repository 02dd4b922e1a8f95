"""SFT + LoRA (reference scenario matrix: reverse_text {sft_lora}): adapters
train under the SFT loop, snapshots are base+merged, and a standalone PEFT
adapter is exported alongside (reference: ckpt.py:322-517)."""

import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

import numpy as np


def test_sft_lora_trains_and_exports_adapter(tmp_path):
    from prime_rl_tpu.configs import SFTConfig
    from prime_rl_tpu.trainer.sft.train import train

    cfg = SFTConfig(
        output_dir=str(tmp_path),
        max_steps=4,
        model={"name": "debug", "seq_len": 64, "lm_head_chunk_size": 0,
               "attn": {"impl": "xla"}, "debug": {"random_init": True},
               "lora": {"rank": 4, "alpha": 8.0}},
        mesh={"fsdp": -1},
        data={"type": "fake", "seq_len": 64},
        weight_ckpt={"interval": 2},
        ckpt={"interval": 1000},
    )
    train(cfg)

    import json
    rows = [json.loads(l) for l in open(next(tmp_path.glob("*.jsonl")))]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert len(losses) == 4 and all(np.isfinite(losses)), losses

    snaps = sorted(tmp_path.glob("weights/step_*"))
    assert snaps, "no merged snapshots"
    assert (snaps[-1] / "adapter" / "adapter_model.safetensors").exists()
    # the adapter holds every configured target, stacked per layer
    from safetensors.numpy import load_file
    ad = load_file(snaps[-1] / "adapter" / "adapter_model.safetensors")
    assert any("lora_A" in k for k in ad) and any("lora_B" in k for k in ad)
