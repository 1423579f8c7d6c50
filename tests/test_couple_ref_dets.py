"""Pinned HF-neighborhood coupling (couple_ref_dets).

In large Hilbert spaces a sampled set has no Hamiltonian-connected pairs
and sample-aware E_loc degenerates to the diagonal (the C2H4 52-qubit
freeze); pinning the top-K |<HF^A|H|HF>| neighbors restores the coupling.
"""

import jax
import numpy as np

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig


def _metrics(vmc):
    params, opt_state, key = vmc.init_state()
    out = vmc._step(params, opt_state, key)
    return {k: float(v) for k, v in out[3].items()}


def test_ref_neighbors_increase_found_pairs():
    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    base_cfg = dict(
        sample_num=16, sampling_mode="gumbel", qubit_per_qudit=3,
        lr=1e-3, seed=3,
    )
    m0 = _metrics(VMC(mol, VMCConfig(**base_cfg),
                      AnqsConfig(hidden_widths=(16,))))
    vmc = VMC(mol, VMCConfig(couple_ref_dets=32, **base_cfg),
              AnqsConfig(hidden_widths=(16,)))
    assert vmc.ref_neighbor_words.shape[0] == 32
    # Neighbors are distinct connected determinants of HF.
    nb = np.asarray(vmc.ref_neighbor_words)
    assert len(np.unique(nb, axis=0)) == 32
    m1 = _metrics(vmc)
    # A 16-state sample of the 225-det sector finds few pairs; pinning the
    # HF neighborhood must add coupling and grow the unique set.
    assert m1["found_pairs"] > m0["found_pairs"]
    assert m1["unique_num"] > m0["unique_num"]
    assert np.isfinite(m1["energy"])


def test_ref_neighbors_noop_under_exact_summation():
    """With the full sector enumerated, the pinned neighbors are
    duplicates and dedup makes the step numerically identical."""
    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    base_cfg = dict(sampling_mode="exact", qubit_per_qudit=3, lr=1e-3,
                    seed=0)
    m0 = _metrics(VMC(mol, VMCConfig(**base_cfg),
                      AnqsConfig(hidden_widths=(16,))))
    m1 = _metrics(VMC(mol, VMCConfig(couple_ref_dets=16, **base_cfg),
                      AnqsConfig(hidden_widths=(16,))))
    for k in ("energy", "energy_var", "found_pairs", "unique_num"):
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-6, err_msg=k)


def test_exact_static_membership_matches_dynamic():
    """Exact-summation step with init-time membership == the dynamic
    (sort + table lookup) step on the same state."""
    mol = Molecule.create(
        MolConfig(name="LiH"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    base = dict(sampling_mode="exact", qubit_per_qudit=3, lr=1e-3, seed=0)
    m_dyn = _metrics(
        VMC(mol, VMCConfig(exact_static_membership=False, **base),
            AnqsConfig(hidden_widths=(16,)))
    )
    vmc = VMC(mol, VMCConfig(**base), AnqsConfig(hidden_widths=(16,)))
    assert vmc.exact_partner_idx is not None
    m_st = _metrics(vmc)
    for k in ("energy", "energy_var", "found_pairs", "unique_num",
              "grad_norm", "ipr"):
        np.testing.assert_allclose(m_dyn[k], m_st[k], rtol=1e-6,
                                   err_msg=k)


def test_exact_static_membership_mesh_agreement():
    """Exact-summation static-membership step under the 8-device mesh ==
    single device (the (N, M) partner-index gathers must survive GSPMD
    row sharding of a sector that does not divide the mesh)."""
    import pytest
    from anqs_quantum_chemistry_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mol = Molecule.create(
        MolConfig(name="H2O"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )
    base = dict(sampling_mode="exact", qubit_per_qudit=3, lr=1e-3, seed=0)

    def run(mesh):
        vmc = VMC(mol, VMCConfig(**base),
                  AnqsConfig(hidden_widths=(16,)), mesh=mesh)
        assert vmc.exact_partner_idx is not None
        params, opt_state, key = vmc.init_state()
        if mesh is None:
            out = vmc._step(params, opt_state, key)
        else:
            with mesh:
                out = jax.jit(vmc._step_impl)(params, opt_state, key)
        return {k: float(v) for k, v in out[3].items()}

    m1 = run(None)
    m8 = run(make_mesh(8))
    for k in m1:
        a, b = m1[k], m8[k]
        if np.isnan(a) and np.isnan(b):
            continue
        assert abs(a - b) <= 1e-5 + 1e-4 * abs(a), (k, a, b)
