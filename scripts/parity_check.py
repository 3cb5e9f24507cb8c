#!/usr/bin/env python
"""Runnable waveform-parity recipe vs the reference implementation.

BASELINE.md's third target is waveform parity (MCD) against the reference
CUDA path. The pretrained snapshot and the reference runtime are not present
in THIS build environment, so the recipe is two halves:

1. On any machine with the reference stack (`pip install chatterbox-tts` or
   the reference repo's Docker image) and the HF snapshot:

       # reference side: synthesize with a fixed seed and save
       curl -o ref.wav 'http://<reference>/tts/generate?text=...&format=wav'

2. Here (TPU box with the snapshot in MODEL_PATH):

       python scripts/parity_check.py --text "..." --ref ref.wav \
           [--voice VOICE_ID] [--out hyp.wav]

   which synthesizes the same text through this engine (checkpoint-compatible
   S3Gen arch) and prints MCD / LSD between the two waveforms.

Exit code 0 iff MCD <= --mcd-threshold (default 8.0 dB — typical
"same-system re-synthesis" territory; identical pipelines land ≪ 1 dB,
different samplers of the same checkpoint a few dB).
"""
import argparse
import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", required=True)
    ap.add_argument("--ref", required=True, help="reference WAV to compare against")
    ap.add_argument("--voice", default=None)
    ap.add_argument("--out", default="/tmp/parity_hyp.wav")
    ap.add_argument("--mcd-threshold", type=float, default=8.0)
    ap.add_argument("--seed-request-id", default="parity-check",
                    help="request id (seeds sampling deterministically)")
    args = ap.parse_args()

    os.environ.setdefault("CHATTERBOX_S3GEN_ARCH", "ref")
    # Parity must measure CONVERSION fidelity only: pin the ENTIRE serving
    # deviation stack off so the MCD number compares the framework's exact
    # reference-semantics path (/root/reference/src/tts_streaming.py:655-699)
    # against the reference output, not the deviations:
    #   * int8 KV cache (serving default; gate-tested in tests/test_int8_kv.py)
    #   * per-voice frozen CFM prompt context (CHATTERBOX_CFM_PROMPT_CACHE,
    #     default "step" since Run E)
    #   * streaming full-overlap CFM (CHATTERBOX_CFM_STREAM, default on since
    #     r4) — one-way attention over frozen generated context
    #   * Pallas decode kernel (exact-match tested, but parity day should
    #     measure the plain XLA path first; flip back after a green run)
    os.environ["CHATTERBOX_KV"] = "native"
    os.environ.setdefault("KV_CACHE_DTYPE", "native")
    os.environ["CHATTERBOX_CFM_PROMPT_CACHE"] = "0"
    os.environ["CHATTERBOX_CFM_STREAM"] = "0"
    os.environ["CHATTERBOX_PROGRESSIVE_SLICES"] = "0"
    os.environ.setdefault("CHATTERBOX_PALLAS", "0")

    import numpy as np

    from chatterbox_tpu.audio.pcm import read_wav, resample, write_wav
    from chatterbox_tpu.audio.quality import log_spectral_distance, mel_cepstral_distortion
    from chatterbox_tpu.runtime import CancellationToken, TTSEngine
    from chatterbox_tpu.runtime.engine import ensure_backend_initialized

    ensure_backend_initialized()
    engine = TTSEngine()

    async def synth() -> bytes:
        await engine.ainit()
        out = b""
        async for chunk in engine.stream(
            text=args.text,
            output_format="wav",
            voice_id=args.voice,
            cfg_guidance_weight=0.5,
            synthesis_temperature=0.8,
            text_processing_chunk_size=150,
            audio_tokens_per_slice=35,
            remove_trailing_milliseconds=0,
            remove_leading_milliseconds=0,
            chunk_overlap_strategy="full",
            crossfade_duration_milliseconds=30,
            request_id=args.seed_request_id,
            cancellation_token=CancellationToken(),
        ):
            out += chunk
        return out

    data = asyncio.run(synth())
    with open(args.out, "wb") as f:
        f.write(data)

    hyp, sr_h = read_wav(args.out)
    ref, sr_r = read_wav(args.ref)
    if sr_r != sr_h:
        ref = resample(ref, sr_r, sr_h)
    mcd = mel_cepstral_distortion(ref, hyp, sr_h)
    lsd = log_spectral_distance(ref, hyp, sr_h)
    result = {
        "mcd_db": round(float(mcd), 3),
        "lsd_db": round(float(lsd), 3),
        "threshold_db": args.mcd_threshold,
        "ref_s": round(len(ref) / sr_h, 2),
        "hyp_s": round(len(hyp) / sr_h, 2),
        "pass": bool(mcd <= args.mcd_threshold),
    }
    print(json.dumps(result))
    engine.shutdown()
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
