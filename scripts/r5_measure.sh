#!/bin/bash
# Round-5 TPU measurement chain (VERDICT r4 items 1, 2, 4, 6, 7).
# Runs detached so API-gateway session crashes don't kill measurements.
# Stages are strictly serialized: one TPU, one host CPU.
# Order: quality study FIRST (the streaming-CFM default's missing quality
# evidence is the round's top gap), then loaded TTFA, gate A/B, long-chunk.
cd /root/repo || exit 1
echo "=== r5 measurement chain start: $(date -u +%FT%TZ) ===" >> /tmp/r5_chain.log

# 1. quality study on the ROUND-5 DEFAULTS (streaming CFM + block ladder +
#    prompt cache + int8 KV): fresh default baseline; the old Run-E table
#    (measured against the pre-streaming default) is preserved separately.
if [ ! -f quality_study_results_r4.json ] && [ -f quality_study_results.json ]; then
    cp quality_study_results.json quality_study_results_r4.json
fi
timeout 14400 python scripts/quality_study.py \
  --only cfm_stream_off,reference_resolve,stream_window_256,reference_exact,kv_native \
  --out quality_study_results.json > /tmp/quality_r5.log 2>&1
echo "quality study done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 2. loaded TTFA trace: the traced request runs with 8 full-overlap streams
#    already in flight (the measured full-mode capacity operating point)
CHATTERBOX_PRECOMPILE_SLICES=35 API_KEY=test \
  timeout 7200 python scripts/ttfa_trace.py --warmups 2 --load 8 \
  > /tmp/ttfa_r5.log 2>&1
echo "ttfa trace done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 3. first-audio dispatch-gate A/B under admission churn (16 staggered short
#    requests; --churn caps decode at 75 tokens internally)
CHATTERBOX_PRECOMPILE_SLICES=35 CHATTERBOX_FIRST_AUDIO_GATE=1 \
  timeout 7200 python scripts/serve_bench.py --churn --streams 16 \
  > /tmp/churn_gate1.log 2>&1
echo "churn gate=1 done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log
CHATTERBOX_PRECOMPILE_SLICES=35 CHATTERBOX_FIRST_AUDIO_GATE=0 \
  timeout 7200 python scripts/serve_bench.py --churn --streams 16 \
  > /tmp/churn_gate0.log 2>&1
echo "churn gate=0 done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 4. long-chunk ring-eviction study (VERDICT r4 item 6): 1000-token decode
#    cap -> ~2000 mel frames > every ring size, so eviction actually fires
CHATTERBOX_MAX_NEW_TOKENS=1000 timeout 14400 python scripts/quality_study.py \
  --only stream_window_256,stream_window_2048 \
  --out quality_study_longchunk.json > /tmp/quality_longchunk_r5.log 2>&1
echo "long-chunk study done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log
echo "=== r5 measurement chain COMPLETE: $(date -u +%FT%TZ) ===" >> /tmp/r5_chain.log
