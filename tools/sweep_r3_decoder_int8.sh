#!/bin/bash
# Round-3 sweep: decoder_int8 + ancestry beam cache at reference scale.
# Sequential nohup runs on the one real v5e chip; each prints one JSON line.
set -u
cd /root/repo
LOG=/tmp/sweep_r3.log
: > "$LOG"
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >> "$LOG"
  ECW_RTFX_CPU_BASELINE=0 "$@" timeout 7200 python bench_rtfx.py >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}
# medium: greedy serving mode with decoder int8 stacked on vocab int8
run med_greedy_b4_int8 env ECW_RTFX_MODEL=medium ECW_RTFX_DTYPE=bfloat16 ECW_RTFX_BATCH=4 ECW_RTFX_VOCAB=int8 ECW_RTFX_DECODER=int8
# medium: beam-5 with the new ancestry cache (default)
run med_beam5_b4_ancestry env ECW_RTFX_MODEL=medium ECW_RTFX_DTYPE=bfloat16 ECW_RTFX_BATCH=4 ECW_RTFX_BEAMS=5
# medium: beam-5 ancestry + both int8
run med_beam5_b4_int8 env ECW_RTFX_MODEL=medium ECW_RTFX_DTYPE=bfloat16 ECW_RTFX_BATCH=4 ECW_RTFX_BEAMS=5 ECW_RTFX_VOCAB=int8 ECW_RTFX_DECODER=int8
# large-v2: greedy serving mode with both int8
run large_greedy_b4_int8 env ECW_RTFX_MODEL=large ECW_RTFX_DTYPE=bfloat16 ECW_RTFX_BATCH=4 ECW_RTFX_VOCAB=int8 ECW_RTFX_DECODER=int8
# large-v2: beam-5 ancestry
run large_beam5_b4_ancestry env ECW_RTFX_MODEL=large ECW_RTFX_DTYPE=bfloat16 ECW_RTFX_BATCH=4 ECW_RTFX_BEAMS=5
echo "SWEEP DONE $(date +%H:%M:%S)" >> "$LOG"
