"""Pallas fused matrix-element kernel vs the two-matmul reference path.

Runs in interpreter mode on CPU (``interpret=True`` via
jax.experimental.pallas on a non-TPU backend would fail to lower; the
public interpret knob here is wrapping the call in
``pltpu.force_tpu_interpret_mode``), asserting exact agreement with
``PauliEngine.matrix_elements(weights_matmul='split')`` on a real molecular
Hamiltonian.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.observables.pauli import PauliEngine
from anqs_quantum_chemistry_tpu.ops import bits as bitops
from anqs_quantum_chemistry_tpu.ops.pallas_kernels import (
    fused_matrix_elements,
)


def test_fused_matrix_elements_matches_split(rng):
    mol = Molecule.create(
        MolConfig(name="H2O"), mols_dir="mols",
        run_fci=False, run_cisd=False,
    )
    eng = PauliEngine(mol.qubit_ham)
    n = mol.qubit_num
    bits = rng.integers(0, 2, size=(96, n))
    words = bitops.pack(jnp.asarray(bits))

    me_ref = np.asarray(eng.matrix_elements(words))

    x_bits = bitops.unpack(words, n, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        me_pl = fused_matrix_elements(
            x_bits.astype(jnp.bfloat16),
            eng.b_bits.astype(jnp.bfloat16),
            eng.group_weight_splits,
            b_tile=32,
            t_tile=256,
        )
    np.testing.assert_allclose(
        np.asarray(me_pl), me_ref, rtol=0, atol=1e-6
    )
    # And both agree with the python-int oracle on a few entries.
    a_ints = [
        sum(int(mol.qubit_ham.a_masks[m, j]) << (32 * j)
            for j in range(mol.qubit_ham.a_masks.shape[1]))
        for m in range(mol.qubit_ham.n_groups)
    ]
    x_ints = [
        sum(int(b) << i for i, b in enumerate(row)) for row in bits[:4]
    ]
    for bi, x in enumerate(x_ints):
        for m in rng.choice(mol.qubit_ham.n_groups, 5, replace=False):
            expected = mol.qubit_ham.dense_matrix_element(
                x, x ^ a_ints[m]
            )
            if x == x ^ a_ints[m]:
                expected -= mol.qubit_ham.constant
            np.testing.assert_allclose(
                me_ref[bi, m], expected, atol=1e-6
            )


def test_hash_lookup_kernel_matches_xla(rng):
    """Pallas fused bucket-hash lookup == the XLA hash path (interpret
    mode), on a real 14-qubit sample set."""
    from anqs_quantum_chemistry_tpu.ops import keys

    mol = Molecule.create(
        MolConfig(name="H2O"), mols_dir="mols",
        run_fci=False, run_cisd=False,
    )
    n = mol.qubit_num
    bits = rng.integers(0, 2, size=(128, n))
    words = bitops.pack(jnp.asarray(bits))
    sw, _ = keys.sort_words(words)
    sv = keys.unique_mask(sw)
    la = jnp.asarray(rng.standard_normal(128), jnp.float32)
    ph = jnp.asarray(rng.standard_normal(128), jnp.float32)

    eng_x = PauliEngine(mol.qubit_ham, membership="hash")
    e_xla = eng_x.local_energy_proxy(sw, la, ph, sv)
    eng_p = PauliEngine(
        mol.qubit_ham, membership="hash", lookup_kernel="pallas"
    )
    with pltpu.force_tpu_interpret_mode():
        e_pl = eng_p.local_energy_proxy(sw, la, ph, sv)
    np.testing.assert_allclose(
        np.asarray(e_pl.e_re), np.asarray(e_xla.e_re), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(e_pl.e_im), np.asarray(e_xla.e_im), atol=1e-5
    )
    assert int(e_pl.found_pairs) == int(e_xla.found_pairs)
