from .audio_io import load_wav, save_wav
from .layout import bct_to_btc, btc_to_bct

__all__ = ["load_wav", "save_wav", "bct_to_btc", "btc_to_bct"]
