#!/bin/bash
# TPU queue, wave 7 (round 4): C2H4 52q closure via support-restricted
# VMC (exact-e_loc Rayleigh-quotient optimization, the round-3
# post-mortem fix), its repeated confirmation, the transformer leg with
# the WATCHDOG MITIGATION (short scan windows; round-3 crashed 3x at
# steps_per_call=25), the Cr2 84-qubit step stress test, and a bench
# refresh. One TPU job at a time (serial compile service).
#
# ADVICE r3 fixes: run_job takes the artifact dir as a parameter (the
# transformer leg no longer force-adds runs/c2h4_sci), and
# commit_artifacts also commits the BEST-stage checkpoint from
# summary.json, not just the highest-numbered one.
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
    commit_artifacts "Queue7: ${name} checkpoint after attempt ${attempt}" \
      "$adir"
    sleep 20
  done
  return 1
}

# Leg 1: support-restricted VMC closure (resumes from the best stage).
if [ "${SKIP_RQ:-0}" != "1" ]; then
  run_job c2h4_rq runs/c2h4_sci 14400 2 \
    python examples/c2h4_support_ci.py rq
  commit_artifacts \
    "Queue7: C2H4 52q support-restricted VMC (exact-e_loc rq leg)" \
    runs/c2h4_sci
fi

# Leg 2: 5 repeated sampled confirmations of the best stage.
run_job c2h4_rq_confirm runs/c2h4_sci 5400 2 \
  python examples/c2h4_support_ci.py confirm
commit_artifacts \
  "Queue7: C2H4 rq-leg repeated confirmation measurements" \
  runs/c2h4_sci

# Leg 3: transformer with the watchdog mitigation -- steps_per_call=5
# at 8192 samples (round-3 crash: 25-step windows exceed the ~60 s
# single-dispatch watchdog); a failed attempt retries at 2.
run_job c2h4_transformer_w5 runs/c2h4_cisd_transformer_emp 14400 1 \
  python examples/cisd_pretrain_vmc.py C2H4 6-31g 3000 8192 transformer \
    4 0 1.0 0.0001 5
if [ $? -ne 0 ]; then
  run_job c2h4_transformer_w2 runs/c2h4_cisd_transformer_emp 14400 2 \
    python examples/cisd_pretrain_vmc.py C2H4 6-31g 3000 8192 transformer \
      4 0 1.0 0.0001 2
fi
commit_artifacts \
  "Queue7: C2H4 transformer leg, short scan windows (watchdog fix)" \
  runs/c2h4_cisd_transformer_emp

# Leg 4 host prep: Cr2 (66 min, CPU) -- overlapped with nothing on the
# TPU; then the 84q step stress test on the TPU.
if [ ! -d mols/Cr2 ]; then
  echo "=== prep_cr2 $(date -u +%H:%M:%S) ===" >> runs/logs/cr2_step.log
  timeout 7200 python tools/prep_cr2.py >> runs/logs/cr2_step.log 2>&1
fi
run_job cr2_step runs/cr2_step.json 7200 2 python examples/cr2_step.py
commit_artifacts "Queue7: Cr2 84q VMC step stress test" runs/cr2_step.json

# Leg 5: bench refresh.
run_job bench runs/logs/bench.log 7200 2 python bench.py
commit_artifacts "Queue7: bench refresh (round 4)" runs/logs/bench.log

echo "QUEUE7 DONE $(date -u)" >> runs/logs/queue.log
