#!/usr/bin/env python
"""Salvage quality-study rows from a partially-completed run.

quality_study.py writes its JSON report only after EVERY variant finishes;
if the invocation is killed (timeout, VM restart) the synthesized WAVs
survive in its tempdir but no rows do. This computes MCD/LSD for every
completed variant WAV against the run's default WAV and merges the rows
into the checked-in report, same schema as quality_study.py.

Usage: python scripts/quality_salvage.py /tmp/quality_study_XXXX \
           [--out quality_study_results.json]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("wav_dir")
    ap.add_argument("--out", default="quality_study_results.json")
    ap.add_argument("--text-chars", type=int, default=96)
    args = ap.parse_args()

    from chatterbox_tpu.audio.pcm import read_wav
    from chatterbox_tpu.audio.quality import (
        log_spectral_distance,
        mel_cepstral_distortion,
    )

    default_path = os.path.join(args.wav_dir, "default.wav")
    if not os.path.exists(default_path):
        sys.exit(f"no default.wav in {args.wav_dir}; nothing to compare against")
    ref, sr = read_wav(default_path)
    report = {
        "text_chars": args.text_chars,
        "tiny": False,
        "default_audio_s": round(len(ref) / sr, 2),
        "variants": {},
    }
    for path in sorted(glob.glob(os.path.join(args.wav_dir, "*.wav"))):
        name = os.path.splitext(os.path.basename(path))[0]
        if name == "default":
            continue
        hyp, _ = read_wav(path)
        report["variants"][name] = {
            "mcd_db": round(mel_cepstral_distortion(ref, hyp, sr), 3),
            "lsd_db": round(log_spectral_distance(ref, hyp, sr), 3),
            "audio_s": round(len(hyp) / sr, 2),
        }
    print(json.dumps(report, indent=1))
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            # merge only when the comparison baseline matches (same contract
            # as quality_study.py's incremental --only merging)
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
