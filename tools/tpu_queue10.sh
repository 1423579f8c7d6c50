#!/bin/bash
# TPU queue, wave 10 (round 5 cold-machine runner). mols/, .jax_cache/
# and non-force-added runs/ files are WIPED between rounds; this script
# re-preps everything its legs need, then drains them serially (ONE TPU
# client at a time -- the compile service is serial and concurrent
# clients wedge the worker).
#
#   0. host re-prep (CPU, nice): C2H4 molecule cache + restricted-H
#      rebuild (h_support.npz, 376 MB, too big to commit; ~40 min),
#      Cr2/SV prep (~60 min). target.npz + ckpt_22 are committed.
#   1. C2H4 hinge-barrier L-BFGS wave (rql), resuming from the best
#      MEASURED stage in runs/c2h4_sci/summary.json.
#   2. 5-shot confirm of the best stage (Li2O-style closure protocol).
#   3. Cr2 84q training probe: 1000 real VMC steps at B=1024
#      (~55 min at the measured 3.11 s/iter).
#
# Every leg commits its artifacts after each attempt; a TPU-worker
# wedge (client at 0% CPU in futex_do_wait with the relay port still
# accepting) is handled by the per-leg timeout + retry.
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
    if [ -d "$p" ]; then
      for f in "$p"/best_energy.npy "$p"/config.json "$p"/result.csv \
               "$p"/result.csv.gz "$p"/summary.json "$p"/target.npz \
               "$p"/confirm_energies.npy; do
        [ -e "$f" ] && git add -f "$f"
      done
      local last best
      last=$(ls "$p" | grep '^ckpt_' | sort -t_ -k2 -n | tail -1)
      [ -n "$last" ] && git add -f "$p/$last"
      best=$(python - "$p" <<'EOF'
import json, os, sys
d = sys.argv[1]
p = os.path.join(d, "summary.json")
if os.path.exists(p):
    s = json.load(open(p))
    # The example writes the authoritative best-stage checkpoint path
    # (ADVICE r4: never re-derive the stage->ckpt naming here).
    bc = s.get("best_ckpt")
    if bc:
        print(bc)
    else:
        rows = [r for r in s.get("stages", [])
                if r.get("accepted") is not False]
        if rows:
            si = min(rows, key=lambda s: s["full_e"])["stage"]
            print(os.path.join(d, f"ckpt_{si + 1 if si < 10 else si}"))
EOF
)
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
    commit_artifacts "Queue10: ${name} checkpoint after attempt ${attempt}" \
      "$adir"
    sleep 20
  done
  return 1
}

# Leg 0a: C2H4 molecule cache (CPU; Molecule.create re-runs integrals +
# SCF + CISD on a cold machine). The `target` cmd exits fast when
# target.npz already exists (it is committed) but still builds the mol.
run_job q10_c2h4_prep runs/c2h4_sci 14400 2 \
  nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
  JAX_PLATFORMS=cpu python examples/c2h4_support_ci.py target

# Leg 0b: restricted H (h_support.npz; ~40 min C++ Slater-Condon).
if [ ! -f runs/c2h4_sci/h_support.npz ]; then
  run_job q10_h_support runs/c2h4_sci 14400 2 \
    nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
    JAX_PLATFORMS=cpu python tools/build_c2h4_support_h.py
fi

# Leg 0c: Cr2/SV prep (~60 min host).
if ! ls mols/Cr2/*.npz >/dev/null 2>&1; then
  run_job q10_cr2_prep runs/cr2_prep_summary.json 14400 2 \
    nice -n 19 env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
    JAX_PLATFORMS=cpu python tools/prep_cr2.py
  commit_artifacts "Queue10: Cr2 re-prep" runs/cr2_prep_summary.json
fi

# Leg 1: hinge-barrier L-BFGS wave (resumes from best measured stage).
run_job q10_rql runs/c2h4_sci 14400 2 \
  python examples/c2h4_support_ci.py rql 1800
commit_artifacts "Queue10: C2H4 hinge-barrier rql wave" runs/c2h4_sci

# Leg 2: 5-shot confirm of the best stage.
run_job q10_confirm runs/c2h4_sci 7200 2 \
  python examples/c2h4_support_ci.py confirm
commit_artifacts "Queue10: C2H4 best-stage 5-shot confirmation" \
  runs/c2h4_sci

# Leg 3: Cr2 84q training probe (1000 steps, ~55 min).
run_job q10_cr2_train runs/cr2_step.json 10800 2 \
  python examples/cr2_step.py 1024 1000
commit_artifacts "Queue10: Cr2 84q 1000-step training probe" \
  runs/cr2_step.json

echo "QUEUE10 DONE $(date -u)" >> runs/logs/queue.log
