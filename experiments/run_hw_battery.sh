#!/bin/bash
# Hardware validation battery for the round-3 kernel restructures.
#
# Runs (in dependency order) once the TPU tunnel is reachable:
#   1. exp_compile_smoke.py — the changed kernels (fused top-2 VMEM
#      kernel f32+int, streaming kernel hoisted-flags/fused-trees)
#      must COMPILE AND RUN on real Mosaic before anything is timed.
#      If this fails, SLAP_TPU_NO_FUSED_TOP2=1 is the kill switch and
#      the streaming restructure needs a revert/fix — do not proceed.
#   2. exp_fused_top2.py   — marginal µs/executed-round A/B + e2e.
#   3. exp_entry_cost.py   — all-done per-instance entry cost.
#   4. exp_big_warround.py — streaming war-round µs/round + bm sweep.
#
# Logs: /tmp/hw_battery/<name>.log, summary line per step in
# /tmp/hw_battery/STATUS.  Each step is timeout-bounded; a failure
# records FAIL and continues with the next independent step.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p /tmp/hw_battery
echo "$(date +%H:%M:%S) battery start" >> /tmp/hw_battery/STATUS

run_step() {
  local name=$1 tmo=$2; shift 2
  echo "$(date +%H:%M:%S) $name START" >> /tmp/hw_battery/STATUS
  if timeout "$tmo" python "$@" > "/tmp/hw_battery/$name.log" 2>&1; then
    echo "$(date +%H:%M:%S) $name OK" >> /tmp/hw_battery/STATUS
    return 0
  else
    echo "$(date +%H:%M:%S) $name FAIL (rc=$?)" >> /tmp/hw_battery/STATUS
    return 1
  fi
}

if run_step smoke 3600 experiments/exp_compile_smoke.py; then
  run_step fused_top2 3600 experiments/exp_fused_top2.py
  run_step entry_cost 2400 experiments/exp_entry_cost.py
  run_step big_warround 5400 experiments/exp_big_warround.py 2048 4096 8192
else
  echo "$(date +%H:%M:%S) smoke FAILED — skipping timed A/Bs" \
    >> /tmp/hw_battery/STATUS
fi
echo "$(date +%H:%M:%S) battery done" >> /tmp/hw_battery/STATUS
