#!/bin/bash
# One-shot measurement sweep for a working-TPU window.  Each step is
# independently timeout-guarded; results accumulate in /tmp/fullbench/.
set -u
OUT=${1:-/tmp/fullbench}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # name timeout cmd...
    local name=$1 t=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    timeout "$t" "$@" > "$OUT/$name.log" 2>&1
    echo "--- $name exit=$? ---"
    grep -aE "kbench|timing|scale|metric|parity|OK|rays" "$OUT/$name.log" | tail -12
    # the axon relay wedges if a new client attaches immediately after the
    # previous one exits — give the device handoff time to settle
    sleep 60
}

run parity   590 python -u tools/tpu_parity.py
run bench    590 python -u bench.py
run kb_b8    590 python -u tools/kbench.py
run kb_b16   590 env SPH_BANDS=16 python -u tools/kbench.py
run kb_b4    590 env SPH_BANDS=4 python -u tools/kbench.py
run kb_kd2   590 env SPH_KD=2 python -u tools/kbench.py
run scale_fl 590 python -u tools/scalebench.py flagship views2x
run scale_v  590 python -u tools/scalebench.py vol64 det2x
run scale_c  590 python -u tools/scalebench.py vol100
echo "=== done ==="
