"""Isolate the TPU-only NaN in the Li2O NADE run.

Runs single steps with per-iteration parameter/metric NaN checks under
several ablations (no SR, no clip, smaller lr) to find which component
blows up on the TPU (the identical CPU run is stable).

Usage: python tools/debug_nade_tpu.py [variant]
variants: full | nosr | noclip | lr3e4 | made
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import jax

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    mol = Molecule.create(
        MolConfig(name="Li2O"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    kw = dict(
        sample_num=8192, sampling_mode="gumbel", qubit_per_qudit=6,
        lr=1e-3, grad_clip_norm=1.0,
        sr=SRConfig(max_indices_num=50), seed=0,
    )
    net = AnqsConfig(
        net_type="nade", hidden_widths=(64, 64),
        aux_hidden_widths=(64, 64),
    )
    if variant == "nosr":
        kw["sr"] = None
    elif variant == "noclip":
        kw["grad_clip_norm"] = None
    elif variant == "lr3e4":
        kw["lr"] = 3e-4
    elif variant == "made":
        net = AnqsConfig(hidden_widths=(512,))

    vmc = VMC(mol, VMCConfig(**kw), net)
    params, opt_state, key = vmc.init_state()
    from jax.flatten_util import ravel_pytree

    if variant == "scanfe":
        kw["full_energy_period"] = 100
        vmc = VMC(mol, VMCConfig(**kw), net)
        params, opt_state, key = vmc.init_state()
        variant = "scan"
    if variant == "scan":
        n_win = int(sys.argv[2]) if len(sys.argv) > 2 else 1
        state = (params, opt_state, key)
        for w in range(n_win):
            out = vmc._multi_step(25)(*state)
            state = out[:3]
            stacked = {k: np.asarray(v) for k, v in out[3].items()}
            for j in range(25):
                print(
                    f"[scan] row {25 * w + j:3d} "
                    f"E {stacked['energy'][j]:+.5f} "
                    f"unique {int(stacked['unique_num'][j])} "
                    f"gnorm {stacked['grad_norm'][j]:.3e} "
                    f"la [{stacked['min_log_abs'][j]:+.1f}, "
                    f"{stacked['max_log_abs'][j]:+.1f}]",
                    flush=True,
                )
            flat, _ = ravel_pytree(out[0])
            print(
                f"window {w}: params finite "
                f"{bool(np.isfinite(np.asarray(flat)).all())}",
                flush=True,
            )
        return

    import sys as _s; n_it = int(_s.argv[2]) if len(_s.argv) > 2 else 12
    for it in range(n_it):
        out = vmc._step(params, opt_state, key)
        params, opt_state, key, m = out[:4]
        flat, _ = ravel_pytree(params)
        flat = np.asarray(flat)
        print(
            f"[{variant}] iter {it:3d} E {float(m['energy']):+.5f} "
            f"unique {int(m['unique_num'])} "
            f"gnorm {float(m['grad_norm']):.3e} "
            f"params finite {np.isfinite(flat).all()} "
            f"max|p| {np.abs(flat).max():.3e}",
            flush=True,
        )
        if not np.isfinite(flat).all():
            bad = np.flatnonzero(~np.isfinite(flat))
            print(f"  first bad param idx {bad[0]} of {flat.size}")
            break


if __name__ == "__main__":
    main()
