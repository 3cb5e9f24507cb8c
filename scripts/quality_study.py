#!/usr/bin/env python
"""Quality study for the TPU-serving throughput knobs.

Synthesizes the same fixed-seed request under the default configuration and
under each knob variant, then reports MCD / LSD (audio/quality.py) of each
variant against the default output — the quality-delta quantification
VERDICT r2 item 3 asks for next to any claimed streams-per-chip gain.

Variants studied:
  * CHATTERBOX_CFM_STEPS      (10 → 8, 6): fewer CFM Euler steps
  * CHATTERBOX_OVERLAP_WINDOW_TOKENS (0 → 105, 70): bounded "full"-overlap
    re-synthesis window
  * CHATTERBOX_KV             (int8 → native): KV-cache dtype (token paths
    may diverge — reported for completeness, see tests/test_int8_kv.py for
    the well-posed gate)

Usage:
    python scripts/quality_study.py [--tiny] [--text "..."] [--out study.json]

Each variant runs in a SUBPROCESS (env knobs are read at engine build time,
and JAX state is per-process). With --tiny this runs on CPU in ~2 min;
without, on the local accelerator with the full-size model (random weights
unless MODEL_PATH has a checkpoint).
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXT = (
    "The quick brown fox jumps over the lazy dog while the orchestra plays "
    "a long and winding melody."
)

VARIANTS = [
    ("default", {}),
    ("cfm_steps_8", {"CHATTERBOX_CFM_STEPS": "8"}),
    ("cfm_steps_6", {"CHATTERBOX_CFM_STEPS": "6"}),
    ("overlap_window_105", {"CHATTERBOX_OVERLAP_WINDOW_TOKENS": "105"}),
    ("overlap_window_70", {"CHATTERBOX_OVERLAP_WINDOW_TOKENS": "70"}),
    ("flow_prompt_125", {"CHATTERBOX_FLOW_PROMPT_TOKENS": "125"}),
    ("cfm8_overlap105", {"CHATTERBOX_CFM_STEPS": "8",
                         "CHATTERBOX_OVERLAP_WINDOW_TOKENS": "105"}),
    ("kv_native", {"CHATTERBOX_KV": "native"}),
    # lever 1 (BENCH_NOTES Run C): a 70-token slice halves how often the
    # ~500-frame voice-prompt window is re-encoded per audio second. Same
    # tokens, same noise key — only the slice boundaries move, so the delta
    # vs default isolates the re-synthesis seam sensitivity.
    ("slice_70", {"STUDY_SLICE": "70"}),
    ("slice70_cfm8", {"STUDY_SLICE": "70", "CHATTERBOX_CFM_STEPS": "8"}),
    ("slice70_cfm8_window140", {"STUDY_SLICE": "70", "CHATTERBOX_CFM_STEPS": "8",
                                "CHATTERBOX_OVERLAP_WINDOW_TOKENS": "140"}),
    # lever 4 (BENCH_NOTES Run C): frozen per-voice CFM prompt context —
    # the estimator solves only the generated frames per slice. "step"
    # caches per Euler step; "static" reuses one context (10× smaller).
    ("prompt_cache_step", {"CHATTERBOX_CFM_PROMPT_CACHE": "step"}),
    ("prompt_cache_static", {"CHATTERBOX_CFM_PROMPT_CACHE": "static"}),
    ("pcache_step_slice70", {"CHATTERBOX_CFM_PROMPT_CACHE": "step",
                             "STUDY_SLICE": "70"}),
    ("pcache_step_cfm8", {"CHATTERBOX_CFM_PROMPT_CACHE": "step",
                          "CHATTERBOX_CFM_STEPS": "8"}),
    # bf16 flow activations (FlowRefConfig.bf16_activations): encoder + CFM
    # compute in the weights' dtype; HiFT stays f32. tests/test_flow_bf16.py
    # holds the tiny-scale exactness/closeness gates.
    ("flow_bf16", {"CHATTERBOX_FLOW_BF16": "1"}),
    ("pcache_step_bf16", {"CHATTERBOX_CFM_PROMPT_CACHE": "step",
                          "CHATTERBOX_FLOW_BF16": "1"}),
    # streaming full-overlap (r4): the CFM solves only each slice's new
    # frames against the request's frozen generated context (ring K/V +
    # halos + GN stats) — replaces the accumulated re-solve entirely.
    # NOTE: since the r4 default flips CHATTERBOX_CFM_STREAM on, a fresh
    # "default" run IS streaming; these two isolate the deviation pairwise
    # (stream_off = the Run E prompt-cache default, reference_resolve = the
    # reference's full re-encode chain with every cache off).
    ("cfm_stream_off", {"CHATTERBOX_CFM_STREAM": "0"}),
    ("reference_resolve", {"CHATTERBOX_CFM_STREAM": "0",
                           "CHATTERBOX_CFM_PROMPT_CACHE": "0"}),
    ("stream_window_256", {"CHATTERBOX_STREAM_WINDOW": "256"}),
    # the COMPOUND deviation row (VERDICT r4 item 4): every serving default
    # reverted at once — native KV, no CFM prompt cache, no streaming CFM,
    # plain XLA decode attention. Its MCD vs "default" is the one number an
    # operator reads as "default stack vs reference semantics"
    # (/root/reference/src/tts_streaming.py:655-699).
    ("reference_exact", {"CHATTERBOX_KV": "native",
                         "KV_CACHE_DTYPE": "native",
                         "CHATTERBOX_CFM_PROMPT_CACHE": "0",
                         "CHATTERBOX_CFM_STREAM": "0",
                         "CHATTERBOX_PALLAS": "0"}),
    # progressive slice growth (r5 capacity candidate): same token stream,
    # fewer/larger streaming blocks — isolates the block-boundary deviation
    ("progressive", {"CHATTERBOX_PROGRESSIVE_SLICES": "1"}),
    # long-chunk window study (VERDICT r4 item 6): meaningful only with
    # CHATTERBOX_MAX_NEW_TOKENS=1000 in the outer env (a 1000-token chunk →
    # ~2000 mel frames > every ring size, so eviction actually triggers;
    # 2048 ≥ 2000 never evicts and isolates ring truncation from the
    # one-way-attention deviation itself).
    ("stream_window_2048", {"CHATTERBOX_STREAM_WINDOW": "2048"}),
]

# Tiny-model harness check (production values never bind on the 64-token
# tiny config: its CFM runs 2 steps, windows < 64 never trigger, int8 KV is
# not the tiny default). These confirm each knob actually changes the
# output through the same plumbing; full-model numbers are the real study.
TINY_VARIANTS = [
    ("default", {}),
    ("cfm_steps_4", {"CHATTERBOX_CFM_STEPS": "4"}),
    ("overlap_window_16", {"CHATTERBOX_OVERLAP_WINDOW_TOKENS": "16"}),
    ("flow_prompt_4", {"CHATTERBOX_FLOW_PROMPT_TOKENS": "4"}),
    ("kv_int8", {"KV_CACHE_DTYPE": "int8"}),  # engine-built tiny cfg honors
                                              # the settings-level override
    ("prompt_cache_step", {"CHATTERBOX_CFM_PROMPT_CACHE": "step"}),
]

_SYNTH_CODE = r"""
import asyncio, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
if os.environ.get("CHATTERBOX_FORCE_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
from chatterbox_tpu.runtime import CancellationToken, TTSEngine
from chatterbox_tpu.runtime.engine import ensure_backend_initialized

ensure_backend_initialized()
engine = TTSEngine()

async def synth():
    await engine.ainit()
    out = b""
    async for chunk in engine.stream(
        text=os.environ["STUDY_TEXT"], output_format="wav", voice_id=None,
        cfg_guidance_weight=0.5, synthesis_temperature=0.8,
        text_processing_chunk_size=150,
        audio_tokens_per_slice=int(os.environ.get("STUDY_SLICE", "35")),
        remove_trailing_milliseconds=0, remove_leading_milliseconds=0,
        chunk_overlap_strategy="full", crossfade_duration_milliseconds=30,
        request_id="quality-study", cancellation_token=CancellationToken(),
    ):
        out += chunk
    return out

data = asyncio.run(synth())
with open(os.environ["STUDY_OUT"], "wb") as f:
    f.write(data)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--text", default=TEXT)
    ap.add_argument("--out", default=None, help="write the JSON report here too")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run (default is "
                         "always included as the comparison baseline)")
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = tempfile.mkdtemp(prefix="quality_study_")
    variants = TINY_VARIANTS if args.tiny else VARIANTS
    if args.only:
        keep = {v.strip() for v in args.only.split(",")} | {"default"}
        variants = [v for v in variants if v[0] in keep]
    wavs = {}
    for name, env_extra in variants:
        out_wav = os.path.join(tmp, f"{name}.wav")
        env = dict(os.environ)
        env.update(env_extra)
        env.update(
            REPO_ROOT=repo_root, STUDY_TEXT=args.text, STUDY_OUT=out_wav,
            CHATTERBOX_S3GEN_ARCH="ref", CHATTERBOX_PRECOMPILE="0",
        )
        # random-weight decode never emits EOS; cap generation like
        # serve_bench does (~10 s audio per text chunk, the real-checkpoint
        # EOS ballpark) so full-overlap variants terminate in bounded time
        env.setdefault("CHATTERBOX_MAX_NEW_TOKENS", "250")
        if args.tiny:
            env.update(CHATTERBOX_TINY_MODEL="1", CHATTERBOX_FORCE_CPU="1")
        sys.stderr.write(f"synthesizing variant {name}...\n")
        proc = subprocess.run([sys.executable, "-c", _SYNTH_CODE], env=env,
                              capture_output=True, text=True)
        if proc.returncode != 0:
            sys.stderr.write(f"{name} FAILED:\n{proc.stderr[-2000:]}\n")
            continue
        wavs[name] = out_wav

    from chatterbox_tpu.audio.pcm import read_wav
    from chatterbox_tpu.audio.quality import log_spectral_distance, mel_cepstral_distortion

    if "default" not in wavs:
        sys.stderr.write("default variant failed; no report\n")
        sys.exit(1)
    ref, sr = read_wav(wavs["default"])
    report = {"text_chars": len(args.text), "tiny": args.tiny,
              "default_audio_s": round(len(ref) / sr, 2), "variants": {}}
    for name, path in wavs.items():
        if name == "default":
            continue
        hyp, _ = read_wav(path)
        report["variants"][name] = {
            "mcd_db": round(mel_cepstral_distortion(ref, hyp, sr), 3),
            "lsd_db": round(log_spectral_distance(ref, hyp, sr), 3),
            "audio_s": round(len(hyp) / sr, 2),
        }
    print(json.dumps(report, indent=1))
    if args.out:
        # incremental runs (--only) merge into an existing report: variants
        # accumulate as long as the comparison baseline is unchanged
        if os.path.exists(args.out):
            try:
                with open(args.out) as f:
                    prev = json.load(f)
                if (prev.get("text_chars") == report["text_chars"]
                        and prev.get("tiny") == report["tiny"]
                        and prev.get("default_audio_s") == report["default_audio_s"]):
                    merged = dict(prev["variants"])
                    merged.update(report["variants"])
                    report["variants"] = merged
            except (OSError, ValueError, KeyError):
                pass
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
