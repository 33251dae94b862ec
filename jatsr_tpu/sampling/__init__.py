from .flow import (
    FlowSampler,
    flow_interpolate,
    u_shaped_timesteps,
)

__all__ = ["flow_interpolate", "u_shaped_timesteps", "FlowSampler"]
