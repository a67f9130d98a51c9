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

run parity    590 python -u tools/tpu_parity.py
# measures all routed-layout candidates incl. taller bands; persists the
# winner to the tune sidecar that bench.py picks up
run autotune 2400 python -u tools/autotune_flagship.py
run bench     590 python -u bench.py
# taller-band sweep (all 256 slot rows/superchunk except the last):
# per-band DMA count scales 1/SRb at ~constant bytes — the fwd fetch
# stage (1.67 of 2.84 ms) is per-band-DMA-bound
run kb_b32r8  590 python -u tools/kbench.py
run kb_b16r16 590 env SPH_BANDS=16 SPH_BR=16 python -u tools/kbench.py
run kb_b8r32  590 env SPH_BANDS=8  SPH_BR=32 python -u tools/kbench.py
run kb_b32r16 590 env SPH_BANDS=32 SPH_BR=16 python -u tools/kbench.py
run kb_b16r32 590 env SPH_BANDS=16 SPH_BR=32 python -u tools/kbench.py
run pod_check 590 python -u tools/sharded_onchip_check.py
run scale_fl  590 python -u tools/scalebench.py flagship views2x
run scale_v   590 python -u tools/scalebench.py vol64 det2x
run scale_c   590 python -u tools/scalebench.py vol100 config5_shard
echo "=== done ==="
