from .dit import DiT, count_params, rope_cos_sin, sinusoidal_time_embedding

__all__ = ["DiT", "count_params", "rope_cos_sin", "sinusoidal_time_embedding"]
