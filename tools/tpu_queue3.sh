#!/bin/bash
# TPU queue, wave 3 (continuation session): regenerate the Li2O FCI
# anchor (direct_ci now host-falls-back on the f64 RQ), resume the C2H4
# MADE campaign to 4000 iters, rerun the H2O/BeH2 ladder with inline
# full energy, then the Li2O closure leg + capacity-probe regeneration.
#
# One TPU job at a time (serial compile service).  After EVERY job the
# artifacts that back documented claims are force-added and committed --
# runs/ is gitignored and only git survives re-provisioning (CLAUDE.md).
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

commit_artifacts() {  # msg path...
  local msg="$1"; shift
  for p in "$@"; do
    [ -e "$p" ] || continue
    if [ -d "$p" ] && ls "$p" | grep -q '^ckpt_'; then
      # run dir: small files + ONLY the latest checkpoint
      for f in "$p"/best_energy.npy "$p"/config.json \
               "$p"/result.csv "$p"/result.csv.gz; do
        [ -e "$f" ] && git add -f "$f"
      done
      local last
      last=$(ls "$p" | grep '^ckpt_' | sort -t_ -k2 -n | tail -1)
      git add -f "$p/$last"
    else
      git add -f "$p"
    fi
  done
  git add -f runs/logs 2>/dev/null
  git commit -q -m "$msg

No-Verification-Needed: artifact/data-only commit from the TPU queue" \
    || true
}

run_job() {  # name timeout_s cmd...
  local name="$1" tmo="$2"; shift 2
  local log="runs/logs/${name}.log"
  for attempt in 1 2 3; do
    wait_relay
    echo "=== ${name} attempt ${attempt} $(date -u +%H:%M:%S) ===" >> "$log"
    timeout "$tmo" "$@" >> "$log" 2>&1
    local rc=$?
    echo "=== ${name} rc=${rc} $(date -u +%H:%M:%S) ===" >> "$log"
    [ $rc -eq 0 ] && return 0
    sleep 20
  done
  return 1
}

run_job li2o_fci_anchor 10800 python tools/li2o_fci_anchor.py
commit_artifacts "Queue3: Li2O FCI anchor regenerated (sparse view + summary)" \
  runs/li2o_fci_sparse.npz runs/li2o_fci_summary.json

run_job c2h4_made 14400 \
  python examples/cisd_pretrain_vmc.py C2H4 6-31g 4000 8192 made 4
commit_artifacts "Queue3: C2H4 MADE campaign resumed to 4000 iters" \
  runs/c2h4_cisd_made

run_job h2o_ladder 5400 \
  python examples/ladder_rerun.py H2O 16000 runs/h2o_r3
commit_artifacts "Queue3: H2O ladder rerun with inline full energy" \
  runs/h2o_r3

run_job beh2_ladder 5400 \
  python examples/ladder_rerun.py BeH2 16000 runs/beh2_r3
commit_artifacts "Queue3: BeH2 ladder rerun with inline full energy" \
  runs/beh2_r3

run_job li2o_closure 14400 python examples/li2o_closure.py
commit_artifacts "Queue3: Li2O closure leg (tempered weights, LR ladder)" \
  runs/li2o_closure

run_job li2o_capacity 7200 python tools/li2o_capacity_probe.py \
  131072 32000 64 6
commit_artifacts "Queue3: Li2O capacity-probe regeneration (log artifact)" \
  runs/logs/li2o_capacity.log

run_job bench 3600 python bench.py
commit_artifacts "Queue3: bench rerun" runs/logs/bench.log
echo "QUEUE3 DONE $(date -u)" >> runs/logs/queue.log
