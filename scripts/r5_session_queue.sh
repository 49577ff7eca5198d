#!/bin/bash
# Round-5 TPU measurement queue — resumable; each item writes a DONE
# marker so relay wedges mid-queue only cost the in-flight item.
# Usage: nohup bash scripts/r5_session_queue.sh > results/r5_queue.log 2>&1 &
cd "$(dirname "$0")/.."
mkdir -p results/r5_queue artifacts
D=results/r5_queue

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((128,128)))))" >/dev/null 2>&1
}

wait_relay() {
  for i in $(seq 1 400); do
    probe && return 0
    sleep 90
  done
  echo "relay never recovered"; exit 1
}

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -f "$D/$name.done" ] && { echo "== $name: already done"; return; }
  wait_relay
  echo "== $name start $(date +%T)"
  if timeout "$tmo" "$@" > "$D/$name.log" 2>&1; then
    touch "$D/$name.done"
    echo "== $name OK $(date +%T)"
  else
    echo "== $name FAILED rc=$? $(date +%T) (log: $D/$name.log)"
  fi
}

# 1. wide-KV one-pass probe (hd128 staircase lever)
run wide_kv 900 python /tmp/probe_wide_kv.py
# 2. stair re-sweep with the one-pass kernel (fwd perf regression check +
#    new hd64/hd128 numbers)
run stair 1800 python scripts/sweep_stair.py
# 3. b=1024 decode crash bisect (VERDICT r4 item 4)
run b1024 2400 python scripts/bisect_b1024_crash.py
# 4. quant study v2 eval on unseen corpora (VERDICT r4 item 2a)
run quant_v2 3600 python scripts/eval_quant_study_v2.py
# 5. TPU smoke with the one-pass kernel (already passed once this round;
#    re-run cheap insurance after any further kernel edits)
run smoke 1800 env FASN_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q
# 6. fresh driver-format bench (warm cache now; cold was captured earlier)
run bench 1600 python bench.py
echo "queue complete $(date +%T)"
