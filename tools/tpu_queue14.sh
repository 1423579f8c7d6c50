#!/bin/bash
# TPU queue, wave 13 (round 5, after the repair chain ships). Legs:
#   1. q14_rql: sharp-wall hinge L-BFGS wave from the NEW best stage
#      (the repair chain's ckpt_70/71; summary.json best_ckpt).
#   2. q14_confirm: 5-shot sampled confirmation of the best stage.
#   3. q14_tr_*: transformer support-restricted treatment (VERDICT r4
#      item 6): measure warm start -> Adam rq wave -> confirm.
# ONE TPU client at a time; per-leg timeout + retry (a killed client
# can wedge the NEXT client at plugin init -- the retry recovers,
# measured q12_refit2).
set -u
cd /root/repo
mkdir -p runs/logs runs/c2h4_sci_tr

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

commit_artifacts() {  # msg dir...
  local msg="$1"; shift
  for p in "$@"; do
    for f in "$p"/best_energy.npy "$p"/config.json "$p"/summary.json \
             "$p"/confirm_energies.npy; do
      [ -e "$f" ] && git add -f "$f"
    done
    local best
    best=$(python -c "
import json
try:
    print(json.load(open('$p/summary.json')).get('best_ckpt', ''))
except Exception:
    pass" 2>/dev/null)
    [ -n "$best" ] && [ -e "$best" ] && git add -f "$best"
  done
  git add -f runs/logs 2>/dev/null
  git commit -q -m "$msg

No-Verification-Needed: artifact/data-only commit from the TPU queue" \
    || true
}

run_job() {  # name timeout_s attempts cmd...
  local name="$1" tmo="$2" tries="$3"; shift 3
  local log="runs/logs/${name}.log"
  for attempt in $(seq 1 "$tries"); do
    wait_relay
    echo "=== ${name} attempt ${attempt} $(date -u +%H:%M:%S) ===" >> "$log"
    timeout "$tmo" "$@" >> "$log" 2>&1
    local rc=$?
    echo "=== ${name} rc=${rc} $(date -u +%H:%M:%S) ===" >> "$log"
    commit_artifacts "Queue13: ${name} attempt ${attempt} artifacts" \
      runs/c2h4_sci runs/c2h4_sci_tr
    [ $rc -eq 0 ] && return 0
    sleep 20
  done
  return 1
}

# rql leg dropped: L-BFGS converged flat at 86.12% (q14_rql.log) -- basin exhausted for quasi-Newton; Adam repair is the mover
# done 01:33 rc=0 (confirm mean -78.188610 +/- 2uHa): run_job q14_confirm 5400 2 python examples/c2h4_support_ci.py confirm

run_job q14_tr_measure 3600 2 \
  python examples/c2h4_support_transformer.py measure
run_job q14_tr_rq 10800 2 \
  python examples/c2h4_support_transformer.py rq 200
run_job q14_tr_confirm 5400 2 \
  python examples/c2h4_support_transformer.py confirm

echo "QUEUE13 DONE $(date -u)" >> runs/logs/queue.log
