#!/usr/bin/env python
"""Export the engine's current weights as a native chatterbox_tpu checkpoint.

Usage: python scripts/export_checkpoint.py OUT_DIR [--tiny]
Loads whatever MODEL_PATH resolves to (reference snapshot, native checkpoint,
or random init) and writes OUT_DIR in the native format that the engine
auto-detects (see chatterbox_tpu/runtime/checkpoint.py).
"""
import argparse
import asyncio
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.tiny:
        os.environ["CHATTERBOX_TINY_MODEL"] = "1"

    from chatterbox_tpu.runtime import TTSEngine
    from chatterbox_tpu.runtime.checkpoint import save_checkpoint

    engine = TTSEngine()
    asyncio.run(asyncio.to_thread(engine._init_models))
    save_checkpoint(args.out_dir, engine.params, engine.cfg)
    print(f"Checkpoint written to {args.out_dir}")


if __name__ == "__main__":
    main()
