"""On-device comparison: lax.top_k vs ops.topk.exact_top_k.

Measures the sampler's selection primitive at the flagship shapes
(frontier * qudit-dim candidates -> sample_num winners). Run on the
real TPU; informs the topk_impl default.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def bench(fn, x, reps=50):
    import jax

    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.ops.topk import exact_top_k

    for n, k in ((1 << 20, 16384), (1 << 20, 32768), (1 << 24, 8192),
                 ((1 << 20) * 3 // 4, 16384)):
        x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
        f_lax = jax.jit(lambda x, k=k: jax.lax.top_k(x, k))
        f_bis = jax.jit(lambda x, k=k: exact_top_k(x, k))
        t_lax = bench(f_lax, x)
        t_bis = bench(f_bis, x)
        v1, i1 = f_lax(x)
        v2, i2 = f_bis(x)
        same = bool(jnp.all(i1 == i2)) and bool(jnp.all(v1 == v2))
        print(
            f"n {n:>9} k {k:>6}: lax {t_lax:7.2f} ms  "
            f"bisect {t_bis:7.2f} ms  ({t_lax / t_bis:4.1f}x)  "
            f"identical {same}",
            flush=True,
        )


if __name__ == "__main__":
    main()
