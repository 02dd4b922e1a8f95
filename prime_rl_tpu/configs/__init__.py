from prime_rl_tpu.configs.algorithm import (
    ActionLossType,
    AlgoConfig,
    EchoAlgoConfig,
    FrozenModelConfig,
    GRPOAlgoConfig,
    HierarchicalGRPOAlgoConfig,
    LengthPenaltyConfig,
    MaxRLAlgoConfig,
    OPDAlgoConfig,
    OPSDAlgoConfig,
    RAEAlgoConfig,
    SamplingConfig,
    SFTAlgoConfig,
)
from prime_rl_tpu.configs.env_server import EnvServerConfig
from prime_rl_tpu.configs.inference import InferenceConfig, KVCacheConfig
from prime_rl_tpu.configs.loader import parse_argv, parse_config, to_toml
from prime_rl_tpu.configs.orchestrator import (
    EnvSourceConfig,
    EvalSourceConfig,
    FilterConfig,
    OrchestratorConfig,
)
from prime_rl_tpu.configs.rl import RLConfig
from prime_rl_tpu.configs.router import RouterConfig
from prime_rl_tpu.configs.shared import (
    AttentionConfig,
    BaseConfig,
    CheckpointConfig,
    LogConfig,
    MeshConfig,
    ModelConfig,
    MonitorConfig,
    OptimizerConfig,
    SchedulerConfig,
    TokenizerConfig,
    WeightCheckpointConfig,
)
from prime_rl_tpu.configs.trainer import (
    BatchConfig,
    DefaultLossConfig,
    FakeDataLoaderConfig,
    IPOLossConfig,
    LossConfig,
    RatioLossConfig,
    SFTConfig,
    TrainerConfig,
    TransportConfig,
    WeightBroadcastConfig,
)

__all__ = [k for k in dir() if not k.startswith("_")]
