from .voice_manager import VoiceManager

__all__ = ["VoiceManager"]
