#!/bin/bash
# TPU queue, wave 12 (round 5 main chain, this session). Prereqs:
# mols/C2H4 (committed), runs/c2h4_sci/{target.npz,ckpt_43} (committed),
# runs/c2h4_sci/h_support.npz (rebuilt by tools/build_c2h4_support_h.py,
# launched before this queue; leg 0 waits for it).
#
#   1. q12_refit: mixed rq_refit magnitude-repair wave on the MADE
#      (objective='rq_refit', clamp +-3, rq guard -- commit 623da95;
#      the pure-refit attempt collapsed rq live, q11_refit.log).
#   2. q12_rql: sharp-wall hinge L-BFGS wave from the best measured
#      stage (summary.json best_ckpt).
#   3. q12_confirm: 5-shot sampled confirmation of the best stage.
#   4. q12_tr_*: the transformer given the same support-restricted
#      treatment (VERDICT r4 item 6): measure warm start -> Adam rq
#      wave -> confirm. runs/c2h4_sci_tr.
#
# ONE TPU client at a time (serial compile service). Every leg commits
# its artifacts after each attempt; per-leg timeout + retry handles
# TPU-worker wedges and relay outages.
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
             "$p"/confirm_energies.npy "$p"/diag_fidelity.json \
             "$p"/diag_counterfactual.json; do
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
    commit_artifacts "Queue12: ${name} attempt ${attempt} artifacts" \
      runs/c2h4_sci runs/c2h4_sci_tr
    [ $rc -eq 0 ] && return 0
    sleep 20
  done
  return 1
}

# Leg 0: wait for the restricted-H rebuild (launched separately on CPU).
while [ ! -s runs/c2h4_sci/h_support.npz ]; do sleep 60; done
# The builder writes the file once at the end (scipy save_npz is not
# atomic but is fast vs our 60 s poll); give it a settling margin.
sleep 90

run_job q12_refit 10800 2 python examples/c2h4_support_ci.py refit 300
run_job q12_rql 10800 2 python examples/c2h4_support_ci.py rql 1200
run_job q12_confirm 7200 2 python examples/c2h4_support_ci.py confirm

run_job q12_tr_measure 3600 2 \
  python examples/c2h4_support_transformer.py measure
run_job q12_tr_rq 10800 2 \
  python examples/c2h4_support_transformer.py rq 300
run_job q12_tr_confirm 7200 2 \
  python examples/c2h4_support_transformer.py confirm

echo "QUEUE12 DONE $(date -u)" >> runs/logs/queue.log
