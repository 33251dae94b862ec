from .config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    Preset,
    SamplerConfig,
    TrainConfig,
    apply_env_aliases,
    data_preset,
    get_preset,
    list_presets,
)

__all__ = [
    "ModelConfig",
    "LossConfig",
    "TrainConfig",
    "DataConfig",
    "SamplerConfig",
    "Preset",
    "apply_env_aliases",
    "data_preset",
    "get_preset",
    "list_presets",
]
