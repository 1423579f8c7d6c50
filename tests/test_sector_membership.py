"""Sampled-mode sector membership (engine.local_energy_sector) must be
numerically equivalent to the dynamic direct-address table: same sample
set -> same local energies, so identical training trajectories up to
reduction-order noise."""

import numpy as np

from anqs_quantum_chemistry_tpu.chem.molecule import MolConfig, Molecule
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig


def run_traj(sector_membership, n_steps=6, **cfg_kw):
    mol = Molecule.create(MolConfig(name="LiH"), mols_dir="mols")
    vmc = VMC(
        mol,
        VMCConfig(
            sample_num=128,
            sampling_mode="gumbel",
            qubit_per_qudit=3,
            lr=1e-2,
            seed=3,
            sector_membership=sector_membership,
            **cfg_kw,
        ),
        AnqsConfig(hidden_widths=(32,)),
    )
    if sector_membership == "on":
        assert vmc.sector_partner_idx is not None
    elif sector_membership == "off":
        assert vmc.sector_words is None
    params, opt_state, key = vmc.init_state()
    run = vmc._multi_step(n_steps)
    _, _, _, m = run(params, opt_state, key)
    return np.asarray(m["energy"]), np.asarray(m["found_pairs"])


def test_sector_matches_table_membership():
    e_tab, f_tab = run_traj("off")
    e_sec, f_sec = run_traj("on")
    np.testing.assert_array_equal(f_tab, f_sec)
    np.testing.assert_allclose(e_sec, e_tab, rtol=1e-5, atol=1e-5)


def test_sector_with_couplings():
    # Spin-flip closure + HF-neighborhood pinning append rows that are
    # still sector members; the sector path must agree with the dynamic
    # table on the augmented unique set too.
    kw = dict(couple_spin_flip=True, couple_ref_dets=8)
    e_tab, f_tab = run_traj("off", **kw)
    e_sec, f_sec = run_traj("on", **kw)
    np.testing.assert_array_equal(f_tab, f_sec)
    np.testing.assert_allclose(e_sec, e_tab, rtol=1e-5, atol=1e-5)


def test_auto_thresholds():
    mol = Molecule.create(MolConfig(name="LiH"), mols_dir="mols")
    on = VMC(
        mol,
        VMCConfig(sample_num=32, sampling_mode="gumbel", qubit_per_qudit=3),
        AnqsConfig(hidden_widths=(16,)),
    )
    assert on.sector_words is not None  # LiH sector (225) fits
    off = VMC(
        mol,
        VMCConfig(
            sample_num=32,
            sampling_mode="gumbel",
            qubit_per_qudit=3,
            sector_membership_max_dets=64,
        ),
        AnqsConfig(hidden_widths=(16,)),
    )
    assert off.sector_words is None
