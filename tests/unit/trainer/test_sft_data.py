"""SFT data: subset interleaving ratios + tools-column rendering
(reference: trainer/sft/data.py:43-659)."""

import numpy as np

from prime_rl_tpu.configs.trainer import SFTDataConfig
from prime_rl_tpu.trainer.sft.data import (
    FakeDataset,
    InterleavedDataset,
    MessagesDataset,
    sample_from_tokens,
)


def test_interleaving_ratios():
    def const(env):
        while True:
            s = sample_from_tokens(np.arange(4), np.ones(4, bool))
            s.env_name = env
            yield s

    ds = InterleavedDataset([const("a"), const("b")], ratios=[3.0, 1.0], seed=0)
    it = iter(ds)
    names = [next(it).env_name for _ in range(4000)]
    frac_a = names.count("a") / len(names)
    assert 0.70 < frac_a < 0.80  # 3:1 mix


def test_tools_column_renders_into_template():
    class ToolTok:
        eos_token_id = 0

        def apply_chat_template(self, messages, tokenize=True,
                                add_generation_prompt=False, tools=None):
            text = ""
            if tools:
                text += f"[TOOLS:{len(tools)}]"
            for m in messages:
                text += f"<{m['role']}>{m['content']}"
            return [ord(c) % 256 for c in text]

    cfg = SFTDataConfig(type="hf", name="x", loss_mask="assistant")
    ds = MessagesDataset.__new__(MessagesDataset)
    ds.config = cfg
    ds.tokenizer = ToolTok()
    msgs = [{"role": "user", "content": "hi"}, {"role": "assistant", "content": "yo"}]
    ids_plain, mask_plain = ds.tokenize_messages(msgs)
    ids_tools, mask_tools = ds.tokenize_messages(msgs, tools=[{"name": "t"}])
    assert len(ids_tools) == len(ids_plain) + len("[TOOLS:1]")
    # the tool schema span is part of the first (untrainable) region
    assert not mask_tools[: len("[TOOLS:1]")].any()
    assert mask_tools.sum() == mask_plain.sum()


def test_fake_dataset_packs():
    cfg = SFTDataConfig(type="fake", seq_len=64, batch_size=4, micro_batch_size=2)
    from prime_rl_tpu.trainer.sft.data import setup_sft_loader

    loader = setup_sft_loader(cfg)
    batch, counts = loader.next_batch()
    assert counts["ce"] > 0 and batch.input_ids.ndim == 3
