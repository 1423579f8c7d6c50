#!/bin/bash
# TPU queue, wave 5: the C2H4 CISD-pretrained TRANSFORMER leg (52
# qubits). The H2O leg proved the recipe (empirical Gumbel weights +
# plain Adam 1e-4 + logit_cap + pretrain rollback -> +0.43 mHa vs FCI);
# this applies it at the peaked-regime scale where the round-2
# transformer froze at exactly HF. Waits for queue4 (one TPU job at a
# time -- serial compile service).
set -u
cd /root/repo
mkdir -p runs/logs

until grep -q "QUEUE4 DONE" runs/logs/queue.log 2>/dev/null; do
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
    if [ -d "$p" ] && ls "$p" | grep -q '^ckpt_'; then
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

run_job c2h4_transformer_cisd 14400 \
  python examples/cisd_pretrain_vmc.py C2H4 6-31g 4000 8192 transformer 4 0
commit_artifacts \
  "Queue5: C2H4 CISD-pretrained transformer leg (52q peaked regime)" \
  runs/c2h4_cisd_transformer_emp
echo "QUEUE5 DONE $(date -u)" >> runs/logs/queue.log
