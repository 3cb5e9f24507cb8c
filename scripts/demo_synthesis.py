#!/usr/bin/env python
"""Synthesize a WAV end-to-end with the engine (tiny random-weight model by
default; uses a real checkpoint if MODEL_PATH points at one).

Usage:
    JAX_PLATFORMS=cpu python scripts/demo_synthesis.py --out /tmp/demo.wav \
        [--text "..."] [--full-model] [--format wav] [--voice VOICE_ID]
"""
import argparse
import asyncio
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/demo.wav")
    ap.add_argument("--text", default="Hello from the TPU native chatterbox rebuild. This is streaming synthesis.")
    ap.add_argument("--format", default="wav")
    ap.add_argument("--voice", default=None)
    ap.add_argument("--full-model", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if not args.full_model:
        os.environ.setdefault("CHATTERBOX_TINY_MODEL", "1")

    from chatterbox_tpu.logging_config import configure_logging
    from chatterbox_tpu.runtime import CancellationToken, TTSEngine

    configure_logging(tag="DEMO")
    engine = TTSEngine()

    async def run():
        t0 = time.time()
        await engine.ainit()
        print(f"init: {time.time()-t0:.1f}s")
        out = b""
        t0 = time.time()
        first = None
        async for chunk in engine.stream(
            text=args.text,
            output_format=args.format,
            voice_id=args.voice,
            cfg_guidance_weight=0.5,
            synthesis_temperature=0.8,
            text_processing_chunk_size=50,
            audio_tokens_per_slice=8 if not args.full_model else 35,
            remove_trailing_milliseconds=0,
            remove_leading_milliseconds=0,
            chunk_overlap_strategy="full",
            crossfade_duration_milliseconds=30,
            request_id="demo",
            cancellation_token=CancellationToken(),
        ):
            if first is None and chunk:
                first = time.time() - t0
            out += chunk
        print(f"TTFA: {first:.3f}s, total: {time.time()-t0:.3f}s, bytes: {len(out)}")
        with open(args.out, "wb") as fh:
            fh.write(out)
        print(f"wrote {args.out}")

    asyncio.run(run())


if __name__ == "__main__":
    main()
