"""Tempered gradient weights: T=1 is bit-compatible with the prior
behavior; T>1 changes the descent direction but not the (Born) energy
estimator, and training still descends."""

import numpy as np

from anqs_quantum_chemistry_tpu.chem.molecule import MolConfig, Molecule
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig


def run(temp, n_steps=8):
    mol = Molecule.create(MolConfig(name="LiH"), mols_dir="mols")
    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=128,
            sampling_mode="gumbel",
            qubit_per_qudit=3,
            lr=1e-2,
            seed=1,
            grad_weight_temperature=temp,
        ),
        AnqsConfig(hidden_widths=(32,)),
    )
    params, opt_state, key = vmc.init_state()
    m = vmc._multi_step(n_steps)(params, opt_state, key)[3]
    return np.asarray(m["energy"])


def test_unit_temperature_is_identity():
    np.testing.assert_array_equal(run(1.0), run(None or 1.0))


def test_tempered_changes_grads_but_still_descends():
    e1 = run(1.0)
    e2 = run(2.0)
    # Same first-iteration energy (pre-update metric is estimator-only).
    np.testing.assert_allclose(e1[0], e2[0], rtol=1e-6)
    # Different trajectories thereafter...
    assert not np.allclose(e1[1:], e2[1:])
    # ...but both descend.
    assert e2[-1] < e2[0]
