#!/usr/bin/env python
"""Register a reference wav as a clonable voice.

Same contract as the reference script (/root/reference/scripts/clone_voice.py):
"cloning" a voice = copying the wav into the voices directory; conditioning is
computed lazily (or at warm-up) by the engine and cached per voice_id.

Usage: python scripts/clone_voice.py path/to/speaker.wav [voice_id]
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chatterbox_tpu.config import get_settings


def clone_voice(wav_path: str, voice_id: str | None = None) -> str:
    if not os.path.isfile(wav_path):
        raise FileNotFoundError(wav_path)
    voice_id = voice_id or os.path.basename(wav_path)
    if os.path.basename(voice_id) != voice_id:
        raise ValueError(f"Invalid voice id: {voice_id!r}")
    voices_dir = get_settings().VOICES_DIR
    os.makedirs(voices_dir, exist_ok=True)
    dest = os.path.join(voices_dir, voice_id)
    if os.path.exists(dest):
        raise FileExistsError(f"Voice '{voice_id}' already exists.")
    shutil.copyfile(wav_path, dest)
    return dest


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    dest = clone_voice(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
    print(f"Voice registered at {dest}")
