#!/bin/bash
# TPU queue, wave 2: ladder reruns with inline full energy + the Li2O
# capacity-probe regeneration (needs runs/li2o_fci.npz from wave 1).
# Launched only after tools/tpu_queue.sh exits (serial TPU).
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

run_job li2o_fci_anchor 10800 python tools/li2o_fci_anchor.py
run_job h2o_ladder 5400 \
  python examples/ladder_rerun.py H2O 16000 runs/h2o_r3
run_job beh2_ladder 5400 \
  python examples/ladder_rerun.py BeH2 16000 runs/beh2_r3
run_job li2o_closure 12000 python examples/li2o_closure.py
run_job li2o_capacity 5400 python tools/li2o_capacity_probe.py \
  131072 32000 64 6
echo "QUEUE2 DONE $(date -u)" >> runs/logs/queue.log
