"""Replica-batched multi-step: each vmapped replica must reproduce the
standalone run with the same seed (it is literally vmap of the same
program, so only fusion-level numerics may differ)."""

import numpy as np

from anqs_quantum_chemistry_tpu.chem.molecule import MolConfig, Molecule
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig


def make_vmc(seed):
    # qubit_per_qudit=2: with a single qudit the MADE's first conditional
    # sees no inputs (causal mask), the initial state is exactly uniform,
    # and early trajectories are seed-independent -- two qudits make the
    # seed-dependence of the weights observable immediately.
    mol = Molecule.create(MolConfig(name="H2"), mols_dir="mols")
    return VMC(
        mol,
        VMCConfig(
            sample_num=16,
            sampling_mode="gumbel",
            lr=1e-2,
            seed=seed,
            qubit_per_qudit=2,
        ),
        AnqsConfig(hidden_widths=(16,)),
    )


def test_ensemble_matches_standalone_runs():
    vmc = make_vmc(0)
    n_rep, n_steps = 3, 4
    sp, so, sk = vmc.init_ensemble_state(n_rep)
    run_ens = vmc._multi_step_ensemble(n_steps, n_rep)
    _, _, _, metrics = run_ens(sp, so, sk)
    e_ens = np.asarray(metrics["energy"])  # (n_rep, n_steps)
    assert e_ens.shape == (n_rep, n_steps)

    for r in range(n_rep):
        solo = make_vmc(r)
        params, opt_state, key = solo.init_state()
        run1 = solo._multi_step(n_steps)
        _, _, _, m1 = run1(params, opt_state, key)
        np.testing.assert_allclose(
            e_ens[r], np.asarray(m1["energy"]), rtol=2e-5, atol=2e-5
        )

    # Distinct seeds actually follow distinct trajectories.
    assert not np.allclose(e_ens[0], e_ens[1])
