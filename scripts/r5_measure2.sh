#!/bin/bash
# Round-5 measurement chain v2 (reprioritized): waits for the in-flight
# quality study, then runs the TPU stages in headline-value order —
# stream split bench, loaded TTFA trace, capacity sweep with the
# progressive-slice candidate, gate A/B churn, long-chunk study.
# Detached so API-gateway session crashes don't kill measurements.
cd /root/repo || exit 1
echo "=== r5 chain v2 start: $(date -u +%FT%TZ) ===" >> /tmp/r5_chain.log

# 0. wait for the quality study already in flight (PID recorded at launch;
#    no pattern matching — pgrep -f can match this script's own shell)
QPID=$(cat /tmp/quality_r5.pid 2>/dev/null)
if [ -n "$QPID" ]; then
    while kill -0 "$QPID" 2>/dev/null; do sleep 30; done
fi
echo "quality study done: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 1. streaming S3Gen split-stage bench at serving shapes (minutes)
BENCH_STREAM=1 BENCH_B=8  timeout 1800 python scripts/s3gen_ref_bench.py \
  > /tmp/stream_split_b8.log 2>&1
BENCH_STREAM=1 BENCH_B=16 timeout 1800 python scripts/s3gen_ref_bench.py \
  > /tmp/stream_split_b16.log 2>&1
echo "split bench done: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 2. loaded TTFA trace at the full-mode capacity operating point
CHATTERBOX_PRECOMPILE_SLICES=35 API_KEY=test \
  timeout 7200 python scripts/ttfa_trace.py --warmups 2 --load 8 \
  > /tmp/ttfa_r5.log 2>&1
echo "ttfa trace done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 3. capacity sweep with the progressive-slice candidate default
#    (ladder now continues past single-rung dips up to 2 misses)
CHATTERBOX_PROGRESSIVE_SLICES=1 CHATTERBOX_PRECOMPILE_SLICES=35 \
  SERVE_BENCH_OUT=serve_bench_results_prog.json \
  timeout 10800 python scripts/serve_bench.py --capacity --streams 32 \
  > /tmp/sweep_prog.log 2>&1
echo "progressive sweep done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 4. first-audio dispatch-gate A/B under admission churn
CHATTERBOX_PRECOMPILE_SLICES=35 CHATTERBOX_FIRST_AUDIO_GATE=1 \
  timeout 7200 python scripts/serve_bench.py --churn --streams 16 \
  > /tmp/churn_gate1.log 2>&1
echo "churn gate=1 done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log
CHATTERBOX_PRECOMPILE_SLICES=35 CHATTERBOX_FIRST_AUDIO_GATE=0 \
  timeout 7200 python scripts/serve_bench.py --churn --streams 16 \
  > /tmp/churn_gate0.log 2>&1
echo "churn gate=0 done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 5. long-chunk ring-eviction study (1000-token decode cap)
CHATTERBOX_MAX_NEW_TOKENS=1000 timeout 14400 python scripts/quality_study.py \
  --only stream_window_256,stream_window_2048 \
  --out quality_study_longchunk.json > /tmp/quality_longchunk_r5.log 2>&1
echo "long-chunk study done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log
echo "=== r5 chain v2 COMPLETE: $(date -u +%FT%TZ) ===" >> /tmp/r5_chain.log
