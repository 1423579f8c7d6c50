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
