#!/bin/bash
# Synthesize ONE quality-study variant into an existing study tempdir and
# merge its MCD/LSD row into the checked-in report via quality_salvage.py.
# Avoids re-synthesizing the default baseline (12+ min cold) per invocation.
#
# Usage: run_variant.sh <wav_dir> <name> [ENV=VAL ...]
set -u
WAV_DIR=$1; NAME=$2; shift 2
cd /root/repo || exit 1
for kv in "$@"; do export "${kv?}"; done
export REPO_ROOT=/root/repo
export STUDY_TEXT="The quick brown fox jumps over the lazy dog while the orchestra plays a long and winding melody."
export STUDY_OUT="$WAV_DIR/$NAME.wav"
export CHATTERBOX_S3GEN_ARCH=ref CHATTERBOX_PRECOMPILE=0
export CHATTERBOX_MAX_NEW_TOKENS=${CHATTERBOX_MAX_NEW_TOKENS:-250}
python - <<'EOF'
import asyncio, os, sys
sys.path.insert(0, os.environ["REPO_ROOT"])
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
EOF
rc=$?
echo "variant $NAME rc=$rc"
exit $rc
