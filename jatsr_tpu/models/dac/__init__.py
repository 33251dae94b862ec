from .model import DAC, DACConfig
from .convert import convert_torch_state_dict

__all__ = ["DAC", "DACConfig", "convert_torch_state_dict"]
