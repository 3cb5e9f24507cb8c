from .cancellation import CancellationToken
from .engine import TTSEngine, EngineConfig, Conditionals

__all__ = ["CancellationToken", "TTSEngine", "EngineConfig", "Conditionals"]
