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


def test_temperature_anneal_via_opt_schedule():
    """grad_weight_temperature rides opt_schedule like any config field:
    a (T=2 -> T=1) anneal reproduces the pure-T trajectories segment by
    segment (each boundary recompiles with the new constant)."""
    mol = Molecule.create(MolConfig(name="LiH"), mols_dir="mols")

    def make(temp=1.0, sched=None):
        return VMC(
            mol,
            VMCConfig(
                sample_num=128,
                sampling_mode="gumbel",
                qubit_per_qudit=3,
                lr=1e-2,
                seed=1,
                grad_weight_temperature=temp,
                opt_schedule=sched,
            ),
            AnqsConfig(hidden_widths=(32,)),
        )

    sched = ((0, {"grad_weight_temperature": 2.0}),
             (4, {"grad_weight_temperature": 1.0}))
    vmc = make(sched=sched)
    params, opt_state, key = vmc.init_state()
    # Segment 1 (iters 0-3) must match the pure-T=2 run bit for bit.
    hot = make(temp=2.0)
    p2, o2, k2 = hot.init_state()
    e_sched = np.asarray(
        vmc._multi_step(4, overrides=vmc._schedule_overrides(0))(
            params, opt_state, key
        )[3]["energy"]
    )
    e_hot = np.asarray(
        hot._multi_step(4)(p2, o2, k2)[3]["energy"]
    )
    np.testing.assert_array_equal(e_sched, e_hot)


def test_tempered_changes_grads_but_still_descends():
    e1 = run(1.0)
    e2 = run(2.0)
    # Same first-iteration energy (pre-update metric is estimator-only).
    np.testing.assert_allclose(e1[0], e2[0], rtol=1e-6)
    # Different trajectories thereafter...
    assert not np.allclose(e1[1:], e2[1:])
    # ...but both descend.
    assert e2[-1] < e2[0]
