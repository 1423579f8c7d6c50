"""On-device comparison: lax.top_k vs ops.topk.exact_top_k.

Measures the sampler's selection primitive at the flagship shapes
(frontier * qudit-dim candidates -> sample_num winners). Protocol:
one jitted lax.scan over reps with per-rep fresh random input (the
axon tunnel replay-caches *identical* dispatches, so repeated same-
input calls measure nothing -- CLAUDE.md); the RNG+reduce baseline is
measured separately and subtracted.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPS = 30


def scan_time(make_body):
    import jax
    import jax.numpy as jnp

    def run(key):
        def body(carry, i):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            return carry + make_body(key), ()

        out, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(REPS, dtype=jnp.int32)
        )
        return out

    f = jax.jit(run)
    out = f(jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(jax.random.PRNGKey(2))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from anqs_quantum_chemistry_tpu.ops.topk import exact_top_k

    for n, k in ((1 << 20, 16384), (1 << 20, 32768), (1 << 24, 8192)):
        def rng_only(key, n=n):
            return jnp.sum(jax.random.normal(key, (n,), jnp.float32))

        def with_lax(key, n=n, k=k):
            x = jax.random.normal(key, (n,), jnp.float32)
            v, _ = jax.lax.top_k(x, k)
            return jnp.sum(v)

        def with_bis(key, n=n, k=k):
            x = jax.random.normal(key, (n,), jnp.float32)
            v, _ = exact_top_k(x, k)
            return jnp.sum(v)

        t0 = scan_time(rng_only)
        t_lax = scan_time(with_lax) - t0
        t_bis = scan_time(with_bis) - t0
        print(
            f"n {n:>9} k {k:>6}: rng {t0:6.2f}  lax {t_lax:7.2f} ms  "
            f"bisect {t_bis:7.2f} ms  ({t_lax / t_bis:4.1f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
