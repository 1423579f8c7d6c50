#!/bin/bash
# TPU queue, wave 8 (round 4, continuation session): waits for the
# in-flight rq wave-2 run (PID file /tmp/rq2.pid) to exit, then runs
# the remaining round-4 legs SERIALLY (one TPU job at a time):
#   1. rq confirm      -- 5 repeated sampled measurements of the best stage
#   2. Cr2 84q step    -- the scale stress test (short: guaranteed to land)
#   3. transformer leg -- watchdog mitigation (steps_per_call=5, retry at 2)
#   4. bench refresh
# Artifacts are committed after every leg (and after every failed
# attempt) so a mid-queue machine wipe loses nothing.
set -u
cd /root/repo
mkdir -p runs/logs

wait_relay() {
  python - <<'EOF'
import socket, time
while True:
    s = socket.socket(); s.settimeout(3)
    try:
        s.connect(("127.0.0.1", 8082)); s.close(); break
    except Exception:
        time.sleep(30)
EOF
}

best_ckpt() {  # dir -> echoes the best-stage ckpt path from summary.json
  python - "$1" <<'EOF'
import json, os, sys
d = sys.argv[1]
p = os.path.join(d, "summary.json")
if os.path.exists(p):
    rows = json.load(open(p)).get("stages", [])
    if rows:
        best = min(rows, key=lambda s: s["full_e"])
        si = best["stage"]
        print(os.path.join(d, f"ckpt_{si + 1 if si < 10 else si}"))
EOF
}

commit_artifacts() {  # msg path...
  local msg="$1"; shift
  for p in "$@"; do
    [ -e "$p" ] || continue
    if [ -d "$p" ]; then
      for f in "$p"/best_energy.npy "$p"/config.json "$p"/result.csv \
               "$p"/result.csv.gz "$p"/summary.json "$p"/target.npz \
               "$p"/confirm_energies.npy; do
        [ -e "$f" ] && git add -f "$f"
      done
      local last best
      last=$(ls "$p" | grep '^ckpt_' | sort -t_ -k2 -n | tail -1)
      [ -n "$last" ] && git add -f "$p/$last"
      best=$(best_ckpt "$p")
      [ -n "$best" ] && [ -e "$best" ] && git add -f "$best"
    else
      git add -f "$p"
    fi
  done
  git add -f runs/logs 2>/dev/null
  git commit -q -m "$msg

No-Verification-Needed: artifact/data-only commit from the TPU queue" \
    || true
}

run_job() {  # name artifact_dir timeout_s attempts cmd...
  local name="$1" adir="$2" tmo="$3" tries="$4"; shift 4
  local log="runs/logs/${name}.log"
  for attempt in $(seq 1 "$tries"); do
    wait_relay
    echo "=== ${name} attempt ${attempt} $(date -u +%H:%M:%S) ===" >> "$log"
    timeout "$tmo" "$@" >> "$log" 2>&1
    local rc=$?
    echo "=== ${name} rc=${rc} $(date -u +%H:%M:%S) ===" >> "$log"
    [ $rc -eq 0 ] && return 0
    commit_artifacts "Queue8: ${name} checkpoint after attempt ${attempt}" \
      "$adir"
    sleep 20
  done
  return 1
}

# Leg 0: wait for the in-flight rq wave-2 run to exit, then commit it.
if [ -f /tmp/rq2.pid ]; then
  RQPID=$(cat /tmp/rq2.pid)
  while kill -0 "$RQPID" 2>/dev/null; do sleep 60; done
fi
commit_artifacts \
  "Queue8: C2H4 rq wave 2 (hotter LR ladder from the wave-1 best stage)" \
  runs/c2h4_sci

# Leg 1: 5 repeated sampled confirmations of the best stage.
run_job c2h4_rq_confirm runs/c2h4_sci 5400 2 \
  python examples/c2h4_support_ci.py confirm
commit_artifacts \
  "Queue8: C2H4 rq-leg repeated confirmation measurements" \
  runs/c2h4_sci

# Leg 2: Cr2 84q step stress test (short; land it before the long
# transformer leg so a round-end wipe cannot lose it).
run_job cr2_step runs/cr2_step.json 7200 2 python examples/cr2_step.py
commit_artifacts "Queue8: Cr2 84q VMC step stress test" runs/cr2_step.json

# Leg 3: transformer with the watchdog mitigation -- steps_per_call=5
# at 8192 samples (round-3 crash: 25-step windows exceed the ~60 s
# single-dispatch watchdog); a failed attempt retries at 2.
run_job c2h4_transformer_w5 runs/c2h4_cisd_transformer_emp 14400 1 \
  python examples/cisd_pretrain_vmc.py C2H4 6-31g 3000 8192 transformer \
    4 0 1.0 0.0001 5
if [ $? -ne 0 ]; then
  run_job c2h4_transformer_w2 runs/c2h4_cisd_transformer_emp 14400 1 \
    python examples/cisd_pretrain_vmc.py C2H4 6-31g 3000 8192 transformer \
      4 0 1.0 0.0001 2
fi
commit_artifacts \
  "Queue8: C2H4 transformer leg, short scan windows (watchdog fix)" \
  runs/c2h4_cisd_transformer_emp

# Leg 4: bench refresh.
run_job bench runs/logs/bench.log 7200 2 python bench.py
commit_artifacts "Queue8: bench refresh (round 4)" runs/logs/bench.log

echo "QUEUE8 DONE $(date -u)" >> runs/logs/queue.log
