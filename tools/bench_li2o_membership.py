"""Li2O/STO-3G full-VMC-step timing: hash vs fingerprint-prefilter
membership, on the real TPU (honest protocol: multi-step scan, evolving
state)."""
import sys
import time

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig

import jax
import numpy as np


def main():
    mol = Molecule.create(MolConfig(name="Li2O"), mols_dir="mols",
                          run_fci=False)
    for membership in sys.argv[1:] or ("prefilter", "hash"):
        vmc = VMC(
            mol,
            VMCConfig(
                sample_num=8192,
                sampling_mode="gumbel",
                qubit_per_qudit=6,
                lr=1e-3,
                sr=SRConfig(max_indices_num=50),
                seed=0,
                engine_overrides={"membership": membership},
            ),
            AnqsConfig(hidden_widths=(512,)),
        )
        params, opt_state, key = vmc.init_state()
        steps = 10
        run = vmc._multi_step(steps)
        out = run(params, opt_state, key)
        jax.block_until_ready(out[3])
        t0 = time.perf_counter()
        out = run(*out[:3])
        jax.block_until_ready(out[3])
        dt = (time.perf_counter() - t0) / steps
        m = {k: float(np.asarray(v)[-1]) for k, v in out[3].items()}
        print(
            f"{membership:9s}: {dt*1e3:7.1f} ms/iter  "
            f"E {m['energy']:+.4f} found {m['found_pairs']:.0f} "
            f"overflow {m['table_overflow']:.0f} "
            f"pf_drop {m.get('pf_dropped_rows', 0):.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
