#!/bin/bash
# TPU queue, wave 9 (round 4): runs AFTER queue8 (PID /tmp/queue8.pid)
# drains its transformer + bench legs.
#   1. cr2_step with the pf_row_chunk HBM fix (queue8's attempts OOMed
#      at compile: 20.9 G of 15.75 G; commit c4df2f9)
#   2. wait for the in-flight rq wave (PID /tmp/rq_wave3.pid; queue8's
#      leg-0 wait was defeated by a wrapper PID in /tmp/rq2.pid), then
#      commit its stages and re-run `confirm` on the new best stage.
# Artifacts are committed after every leg / failed attempt.
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

best_ckpt() {
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
    commit_artifacts "Queue9: ${name} checkpoint after attempt ${attempt}" \
      "$adir"
    sleep 20
  done
  return 1
}

# Leg 0: wait for queue8 to drain (transformer + bench legs).
if [ -f /tmp/queue8.pid ]; then
  Q8=$(cat /tmp/queue8.pid)
  while kill -0 "$Q8" 2>/dev/null; do sleep 60; done
fi

# Leg 1: Cr2 84q step with the row-blocked prefilter.
run_job cr2_step runs/cr2_step.json 10800 2 python examples/cr2_step.py
commit_artifacts "Queue9: Cr2 84q VMC step stress test (row-blocked prefilter)" \
  runs/cr2_step.json

# Leg 2: wait for the rq wave (the actual PYTHON pid, captured at
# queue9 launch), then commit and confirm its best stage.
if [ -f /tmp/rq_wave3.pid ]; then
  RQ=$(cat /tmp/rq_wave3.pid)
  while kill -0 "$RQ" 2>/dev/null; do sleep 60; done
fi
commit_artifacts "Queue9: C2H4 rq wave 3 (hot LR ladder, stages 21+)" \
  runs/c2h4_sci
run_job c2h4_rq_confirm3 runs/c2h4_sci 7200 2 \
  python examples/c2h4_support_ci.py confirm
commit_artifacts \
  "Queue9: C2H4 rq wave-3 repeated confirmation measurements" \
  runs/c2h4_sci

echo "QUEUE9 DONE $(date -u)" >> runs/logs/queue.log
