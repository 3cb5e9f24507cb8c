#!/bin/bash
# Final-session follow-up: waits for the in-flight quality_study PID, then
# measures the remaining priority variants one at a time against the SAME
# default WAV (no baseline re-synthesis), salvage-merging each row as it
# lands so a cutoff loses at most the variant in flight.
# Usage: r5_followup.sh <study_pid> <wav_dir>
set -u
PID=$1; WAV_DIR=$2
cd /root/repo || exit 1
while kill -0 "$PID" 2>/dev/null; do sleep 10; done
echo "study $PID done: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# reference_resolve: stream off + prompt cache off (decode graphs cached
# from default, S3Gen full-re-encode graphs cached from reference_exact)
timeout 900 bash scripts/run_variant.sh "$WAV_DIR" reference_resolve \
  CHATTERBOX_CFM_STREAM=0 CHATTERBOX_CFM_PROMPT_CACHE=0 \
  > /tmp/var_reference_resolve.log 2>&1
python scripts/quality_salvage.py "$WAV_DIR" --out quality_study_results.json \
  > /dev/null 2>&1
echo "reference_resolve rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# kv_native: the sampling-divergence floor calibration vs the NEW default
timeout 900 bash scripts/run_variant.sh "$WAV_DIR" kv_native \
  CHATTERBOX_KV=native > /tmp/var_kv_native.log 2>&1
python scripts/quality_salvage.py "$WAV_DIR" --out quality_study_results.json \
  > /dev/null 2>&1
echo "kv_native rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# stream_window_256: the ring-size deviation pairwise row
timeout 900 bash scripts/run_variant.sh "$WAV_DIR" stream_window_256 \
  CHATTERBOX_STREAM_WINDOW=256 > /tmp/var_stream_window_256.log 2>&1
python scripts/quality_salvage.py "$WAV_DIR" --out quality_study_results.json \
  > /dev/null 2>&1
echo "stream_window_256 rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log
echo "=== follow-up COMPLETE: $(date -u +%FT%TZ) ===" >> /tmp/r5_chain.log
