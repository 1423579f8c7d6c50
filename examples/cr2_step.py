"""Cr2/SV 84-qubit VMC step timing: the scale stress test (VERDICT r3
item 4).

Cr2 is the reference's largest-basis machinery (custom SV/vdz strings,
reference run_pyscf.py:26-106). At 84 qubits / 2.24M terms / 472k flip
groups the engine's 'grouped' matrix elements (class-major reduces, no
dense (T, M) operand) and the prefilter membership row capacities face
~23x more groups than C2H4, so this driver takes REAL jitted VMC steps
and reports s/iter + found-pairs -- training to convergence is out of
scope for the round; the committed artifact is runs/cr2_step.json.

Prereq: `python tools/prep_cr2.py` (66 min host; mols/Cr2 is gitignored
and wiped between rounds).

Usage: python examples/cr2_step.py [sample_num] [steps]
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import numpy as np

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig


def main():
    sample_num = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    t0 = time.perf_counter()
    mol = Molecule.create(
        MolConfig(name="Cr2", basis="sv"), mols_dir="mols",
        run_fci=False, run_cisd=False,
    )
    t_mol = time.perf_counter() - t0
    print(f"Cr2/SV loaded: {mol.qubit_num}q T={mol.qubit_ham.n_terms} "
          f"M={mol.qubit_ham.n_groups} HF {mol.hf_energy:.6f} "
          f"[{t_mol:.0f}s]", flush=True)

    t0 = time.perf_counter()
    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=sample_num, sampling_mode="gumbel",
            qubit_per_qudit=6, seed=0,
            # The 52q freeze lesson (CLAUDE.md) binds harder at 84q: pin
            # the HF neighborhood so the sampled set has connected pairs.
            couple_ref_dets=64,
            sr=SRConfig(max_indices_num=50),
            engine_overrides={
                # Attempts 1-2 OOMed HBM at compile (20.9 G of 15.75 G,
                # 64.7% fragmentation): at B=2048 x M=472k, EVERY (B, M)
                # intermediate of the prefilter (fingerprint hits, top_k
                # keys, matrix elements) is ~3.9 GB, and the dense
                # fallback added (2048, M) la/ph/me grids on top. Fix:
                # run stages 1-3a in 128-row blocks (peak (128, M) =
                # 241 MB/tensor) and size the dense-fallback buffer for
                # the few over-capacity rows instead of the whole batch.
                "me_chunk": 128,
                "pf_row_chunk": 128,
                "prefilter_row_capacity": 1024,
                "prefilter_dense_rows": 64,
            },
        ),
        AnqsConfig(hidden_widths=(1024,), logit_cap=8.0),
    )
    t_build = time.perf_counter() - t0
    print(f"engine built: membership={vmc.engine.membership} "
          f"weights_matmul={vmc.engine.weights_matmul} "
          f"[{t_build:.0f}s]", flush=True)

    params, opt_state, key = vmc.init_state()
    t0 = time.perf_counter()
    params, opt_state, key, m = vmc._step(params, opt_state, key)
    jax.block_until_ready(m["energy"])
    t_first = time.perf_counter() - t0
    print(f"first step (incl. compile): {t_first:.1f}s "
          f"E={float(m['energy']):.6f}", flush=True)

    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        params, opt_state, key, m = vmc._step(params, opt_state, key)
        jax.block_until_ready(m["energy"])
        times.append(time.perf_counter() - t0)
        print(f"step {i}: {times[-1]:.2f}s E={float(m['energy']):.6f} "
              f"unique={int(m['unique_num'])} "
              f"found_pairs={int(m['found_pairs'])}", flush=True)

    out = {
        "molecule": "Cr2/SV",
        "qubits": mol.qubit_num,
        "n_terms": int(mol.qubit_ham.n_terms),
        "n_groups": int(mol.qubit_ham.n_groups),
        "sample_num": sample_num,
        "membership": vmc.engine.membership,
        "weights_matmul": vmc.engine.weights_matmul,
        "sec_per_iter": float(np.median(times)),
        "first_step_incl_compile_s": t_first,
        "engine_build_s": t_build,
        "found_pairs_per_iter": int(m["found_pairs"]),
        "energy_last": float(m["energy"]),
        "hf_energy": mol.hf_energy,
    }
    with open("runs/cr2_step.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
