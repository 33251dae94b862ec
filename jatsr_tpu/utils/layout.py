"""Layout helpers between the reference's [B, C, T] and this framework's
time-major [B, T, C]."""

import numpy as np


def bct_to_btc(x):
    """[B, C, T] (reference layout) -> [B, T, C] (jatsr_tpu layout)."""
    return np.swapaxes(x, -1, -2) if isinstance(x, np.ndarray) else x.swapaxes(-1, -2)


def btc_to_bct(x):
    """[B, T, C] -> [B, C, T]."""
    return np.swapaxes(x, -1, -2) if isinstance(x, np.ndarray) else x.swapaxes(-1, -2)
