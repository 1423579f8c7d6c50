#!/bin/bash
# TPU queue, wave 11 (round 5, post-diagnosis C2H4 chain). Runs AFTER
# the Cr2 training leg frees the TPU (serial compile service: never two
# TPU clients). Prereqs (all present on this warm machine): mols/C2H4,
# runs/c2h4_sci/{target.npz,h_support.npz,ckpt_43}.
#
#   1. refit 300: magnitude-repair stages (support_vmc objective=
#      'refit'; counterfactual diagnosis runs/c2h4_sci/
#      diag_counterfactual.json -- the 27.4 mHa restricted gap is a
#      starved rank-1k..100k tail that rq/CE/fid gradients cannot see).
#   2. rql 1200: sharp-wall hinge L-BFGS wave from the best measured
#      stage (healthy gradients once the tail is un-starved).
#   3. confirm: 5-shot sampled confirmation of the best stage.
#
# Each leg commits its artifacts (summary.json best_ckpt is
# authoritative); per-leg timeout + retry handles worker wedges.
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

commit_artifacts() {  # msg dir
  local msg="$1" p="$2"
  for f in "$p"/best_energy.npy "$p"/config.json "$p"/summary.json \
           "$p"/confirm_energies.npy "$p"/diag_fidelity.json \
           "$p"/diag_counterfactual.json; do
    [ -e "$f" ] && git add -f "$f"
  done
  local best
  best=$(python -c "
import json, sys
try:
    print(json.load(open('$p/summary.json')).get('best_ckpt', ''))
except Exception:
    pass")
  [ -n "$best" ] && [ -e "$best" ] && git add -f "$best"
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
    commit_artifacts "Queue11: ${name} attempt ${attempt} artifacts" \
      runs/c2h4_sci
    [ $rc -eq 0 ] && return 0
    sleep 20
  done
  return 1
}

run_job q11_refit 10800 2 python examples/c2h4_support_ci.py refit 300
run_job q11_rql 10800 2 python examples/c2h4_support_ci.py rql 1200
run_job q11_confirm 7200 2 python examples/c2h4_support_ci.py confirm

echo "QUEUE11 DONE $(date -u)" >> runs/logs/queue.log
