"""Per-stage timing of the N2 flagship *sampled* (Gumbel) workload on TPU.

Usage: python tools/profile_n2_gumbel.py [sample_num] [qpq] [reps]
       [engine_overrides_json]
e.g. ... 16384 10 10 '{"membership": "hash", "hash_epb": 8}'
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig


def main():
    import json

    sample_num = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    qpq = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    overrides = json.loads(sys.argv[4]) if len(sys.argv) > 4 else None

    mol = Molecule.create(
        MolConfig(name="N2", basis="sto-3g"), mols_dir="mols",
        run_fci=False, run_cisd=False,
    )
    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=sample_num,
            sampling_mode="gumbel",
            qubit_per_qudit=qpq,
            lr=1e-3,
            grad_clip_norm=1.0,
            sr=SRConfig(max_indices_num=50),
            seed=0,
            engine_overrides=overrides,
        ),
        AnqsConfig(hidden_widths=(512,)),
    )
    res = vmc.profile_stages(reps=reps)
    total = sum(res.values())
    for k, v in sorted(res.items(), key=lambda kv: -kv[1]):
        print(f"{k:24s} {v:9.2f} ms  ({100 * v / total:5.1f}%)", flush=True)
    print(f"{'TOTAL(stages)':24s} {total:9.2f} ms")


if __name__ == "__main__":
    main()
