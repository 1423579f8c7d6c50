"""Adaptive-budget sampling: grows the multinomial budget until the unique
count target is met (reference sample_precisely, calculations/sample.py:62-75).
"""

import numpy as np
import jax

from anqs_quantum_chemistry_tpu.models import ANQS, AnqsConfig
from anqs_quantum_chemistry_tpu.sampling import sample_precisely
from anqs_quantum_chemistry_tpu.symmetries import (
    Masker,
    QubitGrouping,
    particle_number_symmetry,
    spin_projection_symmetry,
)


def test_sample_precisely_reaches_target():
    n = 8
    masker = Masker(
        [particle_number_symmetry(n, 4), spin_projection_symmetry(n, 0)]
    )
    grouping = QubitGrouping.create(masker, qubit_per_qudit=3)
    anqs = ANQS(grouping, AnqsConfig(hidden_widths=(32,)))
    params = anqs.init(jax.random.PRNGKey(1))

    # Ask for at least 30 unique states with a tiny starting budget: the
    # loop must upscale until it gets there (36 physical states exist).
    out, budget = sample_precisely(
        anqs,
        params,
        jax.random.PRNGKey(4),
        sample_num=64,
        target_unique=30,
        growth=4.0,
    )
    n_unique = int(np.asarray(out.valid).sum())
    assert n_unique >= 30
    assert budget > 64  # must have grown beyond the initial budget
    kept = int(np.asarray(out.counts)[np.asarray(out.valid)].sum())
    assert kept + int(out.dropped) == budget
