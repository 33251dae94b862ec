from .resample import resample, simulate_lr

__all__ = ["resample", "simulate_lr"]
