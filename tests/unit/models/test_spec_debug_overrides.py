"""Debug-override behavior of get_spec (reference: trainer/model.py:656-663
layer truncation; vocab truncation is our byte-tokenizer smoke lever)."""

import pytest

from prime_rl_tpu.models.base import get_spec


def test_num_layers_truncation():
    spec = get_spec("Qwen/Qwen3-0.6B", num_layers=4)
    assert spec.num_layers == 4


def test_vocab_truncation_remaps_special_ids():
    full = get_spec("Qwen/Qwen3-0.6B")
    spec = get_spec("Qwen/Qwen3-0.6B", vocab_size=512)
    assert spec.vocab_size == 512
    # Qwen's own eos/pad sit near 151k — outside the truncated range, so
    # they remap to the ByteTokenizer ChatML ids
    assert full.eos_token_id >= 512
    assert spec.eos_token_id == 258
    assert spec.hidden_size == full.hidden_size  # widths untouched


def test_vocab_truncation_keeps_in_range_ids():
    spec = get_spec("debug", vocab_size=512)
    assert spec.vocab_size == 512
    assert spec.eos_token_id < 512  # debug spec ids already byte-compatible


def test_vocab_below_byte_range_rejected():
    with pytest.raises(ValueError, match="260"):
        get_spec("Qwen/Qwen3-0.6B", vocab_size=128)
