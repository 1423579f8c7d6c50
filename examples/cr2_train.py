"""Cr2/SV 84-qubit REAL training leg (VERDICT r4 item 3).

First committed run that captures correlation at 84 qubits: the goal is
energy strictly below HF (-2085.787294). Uses the exact engine config
proven by examples/cr2_step.py (3.11 s/iter at B=1024, prefilter
membership with chunked rows — full-batch intermediates OOM HBM at
M=472k), plus the VMC driver's checkpoint/resume/CSV machinery so a
TPU-worker death mid-leg resumes from the last ckpt instead of
restarting (reference capability: energy_opt_exp.py:308-734 run-dir
pipeline; Cr2 basis exists for exactly this workload,
run_pyscf.py:26-106).

Usage: python examples/cr2_train.py [sample_num] [steps]
Resumes automatically from the newest runs/cr2_train/ckpt_*.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig

RUN_DIR = "runs/cr2_train"


def main():
    sample_num = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    t0 = time.perf_counter()
    mol = Molecule.create(
        MolConfig(name="Cr2", basis="sv"), mols_dir="mols",
        run_fci=False, run_cisd=False,
    )
    print(f"Cr2/SV loaded: {mol.qubit_num}q T={mol.qubit_ham.n_terms} "
          f"M={mol.qubit_ham.n_groups} HF {mol.hf_energy:.6f} "
          f"[{time.perf_counter() - t0:.0f}s]", flush=True)

    t0 = time.perf_counter()
    vmc = VMC(
        mol,
        VMCConfig(
            iter_num=steps,
            sample_num=sample_num, sampling_mode="gumbel",
            qubit_per_qudit=6, seed=0,
            couple_ref_dets=64,          # 52q-freeze lesson binds at 84q
            grad_clip_norm=1.0,
            sr=SRConfig(max_indices_num=50),
            engine_overrides={
                # HBM budget at (B, M=472k): see cr2_step.py provenance.
                "me_chunk": 128,
                "pf_row_chunk": 128,
                "prefilter_row_capacity": 1024,
                "prefilter_dense_rows": 64,
            },
        ),
        AnqsConfig(hidden_widths=(1024,), logit_cap=8.0),
        run_dir=RUN_DIR,
    )
    print(f"engine built: membership={vmc.engine.membership} "
          f"[{time.perf_counter() - t0:.0f}s]", flush=True)

    resume = None
    if os.path.isdir(RUN_DIR):
        ckpts = sorted(
            (d for d in os.listdir(RUN_DIR) if d.startswith("ckpt_")),
            key=lambda d: int(d.split("_")[1]),
        )
        if ckpts:
            resume = os.path.join(RUN_DIR, ckpts[-1])
            print(f"resuming from {resume}", flush=True)

    last = {"it": -1, "e": float("nan"), "t": time.perf_counter()}

    def on_iter(it, row):
        if it % 25 == 0 or row["energy"] < -2085.787294:
            now = time.perf_counter()
            rate = (now - last["t"]) / max(1, it - last["it"])
            last.update({"it": it, "t": now})
            print(
                f"iter {it}: E={row['energy']:.6f} "
                f"unique={int(row['unique_num'])} "
                f"found_pairs={int(row['found_pairs'])} "
                f"[{rate:.2f} s/iter]",
                flush=True,
            )

    params, opt_state, history, best = vmc.run(
        iter_num=steps,
        checkpoint_every=100,
        resume_from=resume,
        on_iter=on_iter,
    )

    energies = np.array([r["energy"] for r in history])
    tail = float(np.mean(energies[-50:])) if len(energies) >= 50 else None
    out = {
        "molecule": "Cr2/SV",
        "qubits": mol.qubit_num,
        "sample_num": sample_num,
        "steps_run": len(history),
        "hf_energy": mol.hf_energy,
        "best_energy": float(best["energy"]),
        "best_iter": int(best["iter"]),
        "tail50_mean_energy": tail,
        "below_hf": bool(best["energy"] < mol.hf_energy),
        "corr_captured_mha_vs_hf": float(
            (mol.hf_energy - best["energy"]) * 1000.0
        ),
    }
    with open(os.path.join(RUN_DIR, "summary.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
