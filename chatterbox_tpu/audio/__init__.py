from .pcm import float_to_pcm16, make_wav_header, read_wav, resample
from .crossfade import CrossfadeStitcher, equal_power_curves
from .encoding import AudioEncoder, AudioFormat

__all__ = [
    "float_to_pcm16",
    "make_wav_header",
    "read_wav",
    "resample",
    "CrossfadeStitcher",
    "equal_power_curves",
    "AudioEncoder",
    "AudioFormat",
]
