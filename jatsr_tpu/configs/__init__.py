from .config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    SamplerConfig,
    TrainConfig,
    get_preset,
    list_presets,
)

__all__ = [
    "ModelConfig",
    "LossConfig",
    "TrainConfig",
    "DataConfig",
    "SamplerConfig",
    "get_preset",
    "list_presets",
]
