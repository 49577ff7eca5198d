#!/bin/bash
# Round-4 continuation evidence queue (fresh container: results/ + jitcache
# were wiped). Sequential on the single TPU; each step under timeout; DONE
# sentinels make restarts resume instead of repeat.
cd /root/repo || exit 1
mkdir -p results/recovery artifacts
R=results/recovery

step() {
  name=$1; lim=$2; shift 2
  if [ -f "$R/DONE.$name" ]; then echo "[$(date +%T)] skip $name (done)"; return 0; fi
  echo "[$(date +%T)] start $name (limit ${lim}s)"
  timeout "$lim" "$@" > "$R/sess_$name.log" 2>&1
  rc=$?
  echo "[$(date +%T)] $name rc=$rc"
  [ $rc -eq 0 ] && touch "$R/DONE.$name"
  return $rc
}

# 1. warm the persistent jit cache + fresh headline capture (driver's
#    end-of-round bench must not pay cold compiles against its timeout)
step bench1 2100 python bench.py

# 2-3. VERDICT #6: non-toy quant study, one checkpoint per softmax_n.
#    deadline bounds TRAINING; eval adds ~10 min. Resumable.
step quant_n1 4500 python scripts/train_quant_study.py --softmax-n 1 --deadline-s 1800
step quant_n0 4500 python scripts/train_quant_study.py --softmax-n 0 --deadline-s 1800

# 4. Mosaic smoke suite on real v5e (all round-4 kernel paths)
step smoke 2400 env FASN_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q --no-header

# 5. second bench capture (now warm; ~15 min)
step bench2 1800 python bench.py

echo "[$(date +%T)] QUEUE COMPLETE"
