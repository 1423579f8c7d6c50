"""v5e bench: local-energy membership variants at the N2 flagship shape.

Times PauliEngine.local_energy_proxy for each membership backend at
B=16384 x M=536 (the sampled N2 workload) with the scan-over-reps
protocol (replay-cache-proof). Decides the bench.py configuration and
the Pallas hash_lookup default (round-2 VERDICT items #1 and #10).

Usage: python tools/bench_eloc_variants.py [B]
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from anqs_quantum_chemistry_tpu.chem.molecule import Molecule, MolConfig
from anqs_quantum_chemistry_tpu.observables.pauli import PauliEngine
from anqs_quantum_chemistry_tpu.ops import bits as bitops, keys

REPS = 10


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    only = sys.argv[2] if len(sys.argv) > 2 else None
    mol = Molecule.create(
        MolConfig(name="N2", basis="sto-3g"), mols_dir="mols",
        run_fci=False, run_cisd=False,
    )
    rng = np.random.default_rng(0)
    # A realistic sampled set: random sector-ish states (exactness of the
    # physics is irrelevant for timing; shapes and found-density matter).
    bits = rng.integers(0, 2, size=(b, mol.qubit_num))
    words = bitops.pack(jnp.asarray(bits))
    sw, _ = keys.sort_words(words)
    sv = keys.unique_mask(sw)
    la = jnp.asarray(-np.abs(rng.standard_normal(b)), jnp.float32)
    ph = jnp.asarray(rng.standard_normal(b), jnp.float32)

    variants = [
        ("table chunk=4M", dict(membership="table")),
        ("table nochunk", dict(membership="table", lookup_chunk=None)),
        ("hash xla", dict(membership="hash")),
        ("hash xla nochunk", dict(membership="hash", lookup_chunk=None)),
        ("table2", dict(membership="table", table_pairs_per_row=1)),
        ("hash epb16", dict(membership="hash", hash_epb=16)),
        ("hash epb8", dict(membership="hash", hash_epb=8)),
        ("hash epb8 xbits", dict(membership="hash", hash_epb=8,
                                 hash_extra_bits=1)),
        ("pf epb8 cap160", dict(membership="prefilter", hash_epb=8,
                                prefilter_row_capacity=160,
                                prefilter_dense_rows=512)),
        ("hash pallas", dict(membership="hash", lookup_kernel="pallas")),
        ("prefilter", dict(membership="prefilter")),
        ("search", dict(membership="search")),
    ]
    for name, kw in variants:
        if only is not None and only not in name:
            continue
        try:
            eng = PauliEngine(mol.qubit_ham, **kw)

            def run(sw_, la_, ph_, sv_):
                def body(c, i):
                    e = eng.local_energy_proxy(sw_, la_ + c * 1e-12, ph_, sv_)
                    return c + e.e_re.sum(), ()
                c, _ = jax.lax.scan(
                    body, jnp.float32(0.0),
                    jnp.arange(REPS, dtype=jnp.int32),
                )
                return c

            jitted = jax.jit(run)
            out = jitted(sw, la, ph, sv)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = jitted(sw, la, ph, sv)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / REPS * 1e3
            e1 = eng.local_energy_proxy(sw, la, ph, sv)
            print(
                f"{name:20s} {ms:8.2f} ms  found={int(e1.found_pairs)}",
                flush=True,
            )
        except Exception as ex:
            print(f"{name:20s} FAILED: {type(ex).__name__}: {ex}",
                  flush=True)


if __name__ == "__main__":
    main()
