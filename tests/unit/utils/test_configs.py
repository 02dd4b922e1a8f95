"""Config loader + model validation matrix (reference: tests test_configs.py,
test_parsers.py)."""

import pytest

from prime_rl_tpu.configs import (
    MeshConfig,
    OrchestratorConfig,
    RLConfig,
    SFTConfig,
    TrainerConfig,
    parse_argv,
    parse_config,
)


def test_defaults_validate():
    for cls in (TrainerConfig, SFTConfig, OrchestratorConfig, RLConfig):
        cfg = cls()
        assert cfg.output_dir == "outputs"


def test_toml_composition(tmp_path):
    base = tmp_path / "base.toml"
    base.write_text('output_dir = "a"\n[model]\nname = "m1"\nseq_len = 1024\n')
    overlay = tmp_path / "overlay.toml"
    overlay.write_text('[model]\nname = "m2"\n')
    cfg = parse_config(TrainerConfig, [f"@{base}", f"@{overlay}"])
    assert cfg.output_dir == "a"
    assert cfg.model.name == "m2"
    assert cfg.model.seq_len == 1024  # deep merge keeps base field


def test_cli_overrides(tmp_path):
    base = tmp_path / "base.toml"
    base.write_text('[model]\nname = "m1"\n')
    cfg = parse_config(
        TrainerConfig,
        [f"@{base}", "--model.seq-len", "2048", "--max-steps", "None", "--grad-clip=0.5"],
    )
    assert cfg.model.seq_len == 2048
    assert cfg.max_steps is None
    assert cfg.grad_clip == 0.5
    # regression: '=' form must not kebab-convert the value (1e-5 != 1e_5 == 1e5)
    cfg = parse_config(TrainerConfig, ["--optimizer.lr=1e-5"])
    assert cfg.optimizer.lr == 1e-5


def test_discriminated_unions():
    cfg = parse_config(TrainerConfig, ["--optimizer.type", "muon", "--loss.type", "ipo"])
    assert cfg.optimizer.type == "muon"
    assert cfg.loss.ipo_threshold == 0.25


def test_parse_argv_scalars():
    out = parse_argv(["--a.b", "1", "--a.c", "true", "--a.d", "x", "--a.e", "[1, 2]"])
    assert out == {"a": {"b": 1, "c": True, "d": "x", "e": [1, 2]}}


def test_extra_fields_rejected():
    with pytest.raises(Exception):
        parse_config(TrainerConfig, ["--nonexistent-field", "1"])


def test_mesh_resolve():
    assert MeshConfig(fsdp=-1).resolve(8) == {"replica": 1, "fsdp": 8, "expert": 1, "context": 1, "tensor": 1}
    assert MeshConfig(replica=2, fsdp=-1, tensor=2).resolve(8)["fsdp"] == 2
    with pytest.raises(ValueError):
        MeshConfig(fsdp=3).resolve(8)
    with pytest.raises(ValueError):
        MeshConfig(fsdp=-1, tensor=-1).resolve(8)


def test_env_sources_from_toml(tmp_path):
    toml = tmp_path / "orch.toml"
    toml.write_text(
        """
batch_size = 16
[[train_envs]]
name = "reverse_text"
ratio = 2.0
group_size = 4
[train_envs.algo]
type = "grpo"
[[train_envs]]
name = "math"
[train_envs.algo]
type = "opd"
"""
    )
    cfg = parse_config(OrchestratorConfig, [f"@{toml}"])
    assert len(cfg.train_envs) == 2
    assert cfg.train_envs[0].ratio == 2.0
    assert cfg.train_envs[1].algo.type == "opd"


def test_duplicate_env_names_rejected():
    with pytest.raises(Exception):
        OrchestratorConfig(train_envs=[{"name": "a"}, {"name": "a"}])
