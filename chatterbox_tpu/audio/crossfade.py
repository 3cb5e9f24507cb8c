"""Equal-power crossfade stitching for streamed audio slices.

Reproduces the chunk-seam behavior of the reference streaming pipeline
(/root/reference/src/tts_streaming.py:866-874 fade curves, :709-758 hold-back
crossfade logic): the last ``fade_len`` samples of every emitted chunk are held
back and mixed with the head of the next chunk using cos/sin equal-power
curves, so seams between synthesis slices are click-free. Extracted into a
standalone, fully-testable state machine operating on numpy arrays (audio
chunks are ≤ a few seconds, so this is host-side work).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def equal_power_curves(fade_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """(fade_out, fade_in) = (cos, sin) quarter-wave envelopes of length fade_len."""
    t = np.linspace(0.0, 1.0, fade_len, dtype=np.float32)
    return np.cos(t * np.pi / 2).astype(np.float32), np.sin(t * np.pi / 2).astype(np.float32)


def trim_leading(audio: np.ndarray, milliseconds: int, sample_rate: int) -> np.ndarray:
    n = (milliseconds * sample_rate) // 1000
    if n > 0 and audio.shape[0] > n:
        return audio[n:]
    return audio


def trim_trailing(audio: np.ndarray, milliseconds: int, sample_rate: int) -> np.ndarray:
    n = (milliseconds * sample_rate) // 1000
    if n > 0 and audio.shape[0] > n:
        return audio[:-n]
    return audio


class CrossfadeStitcher:
    """Streaming crossfade between successive audio chunks.

    Usage: call ``push(chunk)`` per synthesized slice; it returns the audio
    safe to emit now (possibly empty). Call ``flush()`` once at end-of-stream
    to release the held tail.
    """

    def __init__(self, fade_len: int):
        self.fade_len = int(fade_len)
        if self.fade_len > 0:
            self.fade_out, self.fade_in = equal_power_curves(self.fade_len)
        else:
            self.fade_out = self.fade_in = None
        self._held: Optional[np.ndarray] = None
        self._started = False

    def push(self, chunk: np.ndarray) -> np.ndarray:
        chunk = np.asarray(chunk, dtype=np.float32)
        fl = self.fade_len

        if not self._started:
            self._started = True
            if fl > 0 and chunk.shape[0] > fl:
                self._held = chunk[-fl:]
                return chunk[:-fl]
            self._held = None
            return chunk

        can_fade = (
            fl > 0
            and self._held is not None
            and self._held.shape[0] == fl
            and chunk.shape[0] > fl
        )
        if can_fade:
            mixed = self._held * self.fade_out + chunk[:fl] * self.fade_in
            body = chunk[fl:-fl] if chunk.shape[0] > 2 * fl else np.empty(0, np.float32)
            self._held = chunk[-fl:]
            return np.concatenate([mixed, body])

        # Fallback (no fade possible): emit whatever was held, hold the new tail.
        out = self._held if self._held is not None else np.empty(0, np.float32)
        if fl > 0 and chunk.shape[0] > fl:
            self._held = chunk[-fl:]
        else:
            self._held = chunk
        return out

    def flush(self) -> np.ndarray:
        """Release the held tail at end-of-stream."""
        out = self._held if self._held is not None else np.empty(0, np.float32)
        self._held = None
        return out
