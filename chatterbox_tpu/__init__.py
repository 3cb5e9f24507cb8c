"""chatterbox_tpu — a TPU-native streaming TTS serving framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
akashdeep000/chatterbox-tts serving stack (reference layout documented in
/root/repo/SURVEY.md): a zero-shot voice-cloning TTS pipeline
(T3 autoregressive speech-token decoder -> S3Gen token-to-waveform ->
container encoding) behind a streaming HTTP API.

Package layout:
  text/       sentence segmentation + chunk packing (reference: src/text_processing.py)
  audio/      PCM conversion, crossfade, container encoders (reference: src/audio_encoding.py)
  models/     T3, S3Gen, S3Tokenizer, VoiceEncoder, text tokenizer (reference: chatterbox pip pkg)
  ops/        Pallas TPU kernels (decode attention, sampling) and core numerics
  parallel/   device mesh, sharding rules, collectives
  runtime/    engine, jitted decode loops, continuous-batching scheduler, weight loading
  serve/      HTTP surface (aiohttp), voice manager, telemetry
  training/   training step used for multi-chip shard validation
"""

__version__ = "0.1.0"
