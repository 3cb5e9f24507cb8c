#!/bin/bash
# Round-5 final-session measurement chain (VM restart killed the earlier
# chains; /tmp and the XLA compile cache were wiped, so every stage pays a
# cold compile). Stages in VERDICT-priority order, each individually bounded
# so a slow stage cannot starve the rest of the hour.
cd /root/repo || exit 1
echo "=== r5 chain v3 start: $(date -u +%FT%TZ) ===" >> /tmp/r5_chain.log

# 1a. quality study, top-priority pair: the streaming-CFM default's pairwise
#     isolation (cfm_stream_off) and the COMPOUND deviation row
#     (reference_exact). Merges into the checked-in report.
timeout 1500 python scripts/quality_study.py \
  --only cfm_stream_off,reference_exact \
  --out quality_study_results.json > /tmp/quality_r5a.log 2>&1
echo "quality 1a done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 1b. second-priority rows: reference full re-solve, ring-window size, and
#     the kv_native floor calibration against the NEW (streaming) default.
timeout 1800 python scripts/quality_study.py \
  --only reference_resolve,stream_window_256,kv_native \
  --out quality_study_results.json > /tmp/quality_r5b.log 2>&1
echo "quality 1b done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 2. loaded TTFA trace at the measured full-mode capacity point (8 streams
#    in flight); persists ttfa_trace_results.json — the artifact VERDICT r4
#    item 2 demands.
CHATTERBOX_PRECOMPILE_SLICES=35 API_KEY=test \
  timeout 2400 python scripts/ttfa_trace.py --warmups 2 --load 8 \
  > /tmp/ttfa_r5.log 2>&1
echo "ttfa trace done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 3. first-audio dispatch-gate A/B under admission churn (VERDICT item 7)
CHATTERBOX_PRECOMPILE_SLICES=35 CHATTERBOX_FIRST_AUDIO_GATE=1 \
  timeout 1500 python scripts/serve_bench.py --churn --streams 16 \
  > /tmp/churn_gate1.log 2>&1
echo "churn gate=1 done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log
CHATTERBOX_PRECOMPILE_SLICES=35 CHATTERBOX_FIRST_AUDIO_GATE=0 \
  timeout 1500 python scripts/serve_bench.py --churn --streams 16 \
  > /tmp/churn_gate0.log 2>&1
echo "churn gate=0 done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log

# 4. progressive-slice quality row (H.4 candidate's deviation isolation)
timeout 1200 python scripts/quality_study.py \
  --only progressive \
  --out quality_study_results.json > /tmp/quality_r5c.log 2>&1
echo "quality progressive done rc=$?: $(date -u +%FT%TZ)" >> /tmp/r5_chain.log
echo "=== r5 chain v3 COMPLETE: $(date -u +%FT%TZ) ===" >> /tmp/r5_chain.log
