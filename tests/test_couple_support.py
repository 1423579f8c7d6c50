"""couple_support_file: pin an explicit enriched support into every
batch (the generalization of couple_ref_dets; Li2O support-quality fix).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anqs_quantum_chemistry_tpu.chem import fci as fci_mod
from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig


def _mol():
    return Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=True
    )


def _support_file(tmp_path, mol, dets):
    path = str(tmp_path / "support.npz")
    np.savez(
        path,
        dets=np.array(dets, np.uint64),
        coef=np.linspace(1.0, 0.5, len(dets)),
    )
    return path


def _vmc(mol, **cfg):
    defaults = dict(
        sample_num=32, sampling_mode="gumbel", qubit_per_qudit=3,
        lr=1e-3, seed=0, use_theor_freqs=True,
    )
    defaults.update(cfg)
    return VMC(mol, VMCConfig(**defaults), AnqsConfig(hidden_widths=(16,)))


def test_pinned_support_increases_coverage(tmp_path):
    """With a tiny sample window, pinning extra sector dets must add
    valid unique rows and found pairs."""
    mol = _mol()
    sector = fci_mod.sector_determinants(mol.qubit_num, 2, 2)
    path = _support_file(tmp_path, mol, sector[:64])

    base = _vmc(mol)
    pinned = _vmc(mol, couple_support_file=path, couple_support_k=64)
    params, opt_state, key = base.init_state()

    _, _, _, m0 = base._step(params, opt_state, key)
    _, _, _, m1 = pinned._step(params, opt_state, key)
    assert float(m1["unique_num"]) > float(m0["unique_num"])
    assert float(m1["found_pairs"]) >= float(m0["found_pairs"])
    assert np.isfinite(float(m1["energy"]))


def test_pinning_full_sector_is_energy_invariant(tmp_path):
    """If the sample already enumerates the whole sector, pinning sector
    dets only creates duplicates -- the deduped Born energy must match
    the unpinned one exactly."""
    mol = _mol()
    sector = fci_mod.sector_determinants(mol.qubit_num, 2, 2)
    path = _support_file(tmp_path, mol, sector)

    base = _vmc(mol, sample_num=len(sector))
    pinned = _vmc(
        mol, sample_num=len(sector),
        couple_support_file=path, couple_support_k=len(sector),
    )
    params, opt_state, key = base.init_state()
    _, _, _, m0 = base._step(params, opt_state, key)
    _, _, _, m1 = pinned._step(params, opt_state, key)
    np.testing.assert_allclose(
        float(m0["energy"]), float(m1["energy"]), rtol=1e-6
    )
    assert float(m1["unique_num"]) == float(m0["unique_num"])


def test_pinned_training_descends(tmp_path):
    """A short pinned run trains normally (energy descends, stays
    variational)."""
    mol = _mol()
    sector = fci_mod.sector_determinants(mol.qubit_num, 2, 2)
    path = _support_file(tmp_path, mol, sector[::3])
    vmc = _vmc(
        mol, sample_num=48, lr=5e-3, iter_num=200,
        couple_support_file=path, couple_support_k=32,
    )
    _, _, history, best = vmc.run(checkpoint_every=None, steps_per_call=25)
    assert best["energy"] < history[0]["energy"] - 0.05
    assert best["energy"] > mol.fci_energy - 1e-5
