#!/bin/bash
# Serial TPU campaign queue (round-3 regeneration + round-4 levers).
# One TPU job at a time (the axon compile service is serial); each job
# is retried through relay outages (campaign scripts checkpoint and
# auto-resume). Logs land in runs/logs/.
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

run_job h2o_transformer 7200 \
  python examples/cisd_pretrain_vmc.py H2O sto-3g 6000 1024 transformer 2 0
run_job li2o_fci_anchor 7200 python tools/li2o_fci_anchor.py
run_job li2o_nade_t2 14400 \
  python examples/cisd_pretrain_vmc.py Li2O sto-3g 16000 8192 nade 6 1 2.0
run_job n2_convergence 7200 python examples/n2_convergence.py 10000 runs/n2_r3
run_job c2h4_made 21600 \
  python examples/cisd_pretrain_vmc.py C2H4 6-31g 4000 8192 made 4
run_job bench 3600 python bench.py
echo "QUEUE DONE $(date -u)" >> runs/logs/queue.log
