"""Direct-CI (string-based sigma build) vs the brute-force FCI oracle.

The direct solver (chem/direct_ci.py) is the standalone counterpart of
PySCF's C direct-CI that the reference relies on for large FCI anchors
(reference: nqs/nqs/applications/quantum_chemistry/run_pyscf.py:266-276);
these tests pin it against chem/fci.py's sparse exact diagonalization on
sectors small enough for both.
"""

import numpy as np
import pytest

from anqs_quantum_chemistry_tpu.chem.direct_ci import (
    ci_strings,
    direct_ci_ground_state,
    excitation_tables,
    same_spin_dense,
    spatial_from_spin_orbital,
)
from anqs_quantum_chemistry_tpu.chem.molecule import MolConfig, Molecule


@pytest.fixture(scope="module")
def lih():
    return Molecule.create(MolConfig(name="LiH"), mols_dir="mols")


def test_excitation_tables_reproduce_slater_condon_singles(lih):
    """E_kl applied via (src, w) matches <I|a+_k a_l|J> matrix elements
    computed directly from fermionic parities on small strings."""
    n_orb = 4
    strs = ci_strings(n_orb, 2)
    src, w = excitation_tables(strs, n_orb)
    # Brute force: build E_kl as a dense matrix from operator action.
    for k in range(n_orb):
        for l in range(n_orb):
            dense = np.zeros((len(strs), len(strs)))
            for j, s in enumerate(strs):
                s = int(s)
                if not (s >> l) & 1:
                    continue
                par_l = bin(s & ((1 << l) - 1)).count("1")
                s1 = s & ~(1 << l)
                if (s1 >> k) & 1:
                    continue
                par_k = bin(s1 & ((1 << k) - 1)).count("1")
                i = int(np.searchsorted(strs, s1 | (1 << k)))
                dense[i, j] = (-1.0) ** (par_l + par_k)
            got = np.zeros_like(dense)
            kl = k * n_orb + l
            for i in range(len(strs)):
                if w[kl, i] != 0.0:
                    got[i, src[kl, i]] = w[kl, i]
            np.testing.assert_array_equal(got, dense)


def test_sigma_matches_sparse_hamiltonian(lih):
    """sigma(c) == H @ c elementwise against the brute-force sector H."""
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.chem.direct_ci import make_sigma
    from anqs_quantum_chemistry_tpu.chem.fci import (
        sector_determinants,
        sparse_hamiltonian,
    )

    mol = lih
    n_orb = mol.h1.shape[0] // 2
    str_a = ci_strings(n_orb, mol.n_alpha)
    s = len(str_a)
    h_ss = same_spin_dense(str_a, mol.h1, mol.v)
    src, w = excitation_tables(str_a, n_orb)
    _, g2 = spatial_from_spin_orbital(mol.h1, mol.v)
    g2p = g2.reshape(n_orb**2, n_orb**2).astype(np.float32)

    sigma, sa_pad, sb_pad = make_sigma(n_orb, s, s, block=128)
    assert sa_pad == sb_pad
    rng = np.random.default_rng(0)
    c = np.zeros((sa_pad, sb_pad), np.float32)
    c[:s, :s] = rng.standard_normal((s, s)).astype(np.float32)

    from anqs_quantum_chemistry_tpu.chem.direct_ci import _pad_tables

    src_p, w_p = _pad_tables(src, w, sa_pad)
    h_pad = np.zeros((sa_pad, sa_pad), np.float32)
    h_pad[:s, :s] = h_ss
    got = np.asarray(
        sigma(
            jnp.asarray(c),
            jnp.asarray(h_pad),
            jnp.asarray(h_pad),
            jnp.asarray(g2p),
            jnp.asarray(src_p),
            jnp.asarray(w_p),
            jnp.asarray(src_p),
            jnp.asarray(w_p),
            np.float32(0.0),
        )
    )[:s, :s]

    # Oracle: brute-force sector Hamiltonian in (Ia, Ib) grid order.
    dets = sector_determinants(2 * n_orb, mol.n_alpha, mol.n_beta)
    h_sp = sparse_hamiltonian(dets, mol.h1, mol.v)
    det_index = {d: i for i, d in enumerate(dets)}
    alpha_bits = np.zeros(s, np.int64)
    for k in range(n_orb):
        alpha_bits += ((str_a >> k) & 1) << (2 * k)
    grid = np.array(
        [
            [det_index[int(a | (b << 1))] for b in alpha_bits]
            for a in alpha_bits
        ]
    )
    # The string basis orders alpha creators before beta creators; the
    # interleaved det basis is a diagonal +-1 similarity away.
    from anqs_quantum_chemistry_tpu.chem.direct_ci import interleave_parity

    par = interleave_parity(str_a, str_a, n_orb)
    c_flat = np.zeros(len(dets))
    c_flat[grid.ravel()] = (par * c[:s, :s]).ravel()
    want = par * (h_sp @ c_flat)[grid.ravel()].reshape(s, s)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)


def test_host_sigma_f64_matches_device_oracle(lih):
    """host_sigma_f64 (the f64 Rayleigh-quotient fallback for when the
    TPU AOT toolchain rejects the f64 device sigma at Li2O scale)
    reproduces H @ c against the brute-force sector Hamiltonian."""
    from anqs_quantum_chemistry_tpu.chem.direct_ci import (
        _pad_tables,
        host_sigma_f64,
        interleave_parity,
    )
    from anqs_quantum_chemistry_tpu.chem.fci import (
        sector_determinants,
        sparse_hamiltonian,
    )

    mol = lih
    n_orb = mol.h1.shape[0] // 2
    str_a = ci_strings(n_orb, mol.n_alpha)
    s = len(str_a)
    h_ss = same_spin_dense(str_a, mol.h1, mol.v)
    src, w = excitation_tables(str_a, n_orb)
    _, g2 = spatial_from_spin_orbital(mol.h1, mol.v)
    g2p = g2.reshape(n_orb**2, n_orb**2)

    rng = np.random.default_rng(1)
    c = rng.standard_normal((s, s))
    got = host_sigma_f64(
        c, h_ss, h_ss, g2p, src, w, src, w, block=13
    )

    dets = sector_determinants(2 * n_orb, mol.n_alpha, mol.n_beta)
    h_sp = sparse_hamiltonian(dets, mol.h1, mol.v)
    det_index = {d: i for i, d in enumerate(dets)}
    alpha_bits = np.zeros(s, np.int64)
    for k in range(n_orb):
        alpha_bits += ((str_a >> k) & 1) << (2 * k)
    grid = np.array(
        [
            [det_index[int(a | (b << 1))] for b in alpha_bits]
            for a in alpha_bits
        ]
    )
    par = interleave_parity(str_a, str_a, n_orb).astype(np.float64)
    c_flat = np.zeros(len(dets))
    c_flat[grid.ravel()] = (par * c).ravel()
    want = par * (h_sp @ c_flat)[grid.ravel()].reshape(s, s)
    # h_ss is stored f32 (like the device tables the production path
    # upcasts), so agreement is f32-input-limited, not f64-limited.
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_molecule_auto_direct_ci_beyond_eigsh_cap():
    """Molecule.create runs direct CI automatically for >20-qubit sectors
    under MAX_DIRECT_CI_NDET (LiH/6-31G: 22 qubits, 3025 dets), and the
    anchor survives the cache round trip."""
    cfg = MolConfig(name="LiH", basis="6-31g")
    mol = Molecule.create(cfg, mols_dir="mols")
    assert mol.qubit_num > 20
    assert mol.fci_energy is not None
    assert mol.fci_energy < mol.cisd_energy < mol.hf_energy
    # Variational sanity: FCI below CISD by a sub-mHa sliver on a 4-electron
    # system (CISD misses only triples/quadruples).
    assert mol.cisd_energy - mol.fci_energy < 2e-3
    again = Molecule.create(cfg, mols_dir="mols")
    assert again.fci_energy == pytest.approx(mol.fci_energy, abs=1e-12)


@pytest.mark.parametrize("name", ["LiH", "OH"])
def test_direct_ci_matches_fci_table(name):
    """Full Davidson solve vs the cached eigsh FCI (OH = open shell,
    distinct alpha/beta string sets)."""
    mol = Molecule.create(MolConfig(name=name), mols_dir="mols")
    res = direct_ci_ground_state(
        mol.h1, mol.v, mol.n_alpha, mol.n_beta, mol.e_nuc, tol=1e-4
    )
    assert abs(res.energy - mol.fci_energy) < 2e-5, (
        res.energy,
        mol.fci_energy,
    )
    assert abs(res.ipr - mol.fci_ipr) < 1e-3
