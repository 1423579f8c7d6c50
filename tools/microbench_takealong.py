"""v5e microbench: minor-dim take_along_axis at the compaction shapes.

Decides whether partner-table compaction (dropping the ~75% of (det,
group) pairs with no structural partner) can afford the matrix-element
realignment gather me[i, grp[i, k]]: (B, M) -> (B, K) along the minor
axis. Scan-over-reps protocol (axon replay-cache-proof).
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    B, M, K = 16384, 536, 192
    g = jax.random.randint(
        jax.random.PRNGKey(1), (B, K), 0, M, dtype=jnp.int32
    )

    def run(key, with_gather):
        def body(c, i):
            me = jax.random.normal(
                jax.random.fold_in(key, i), (B, M), jnp.float32
            )
            if with_gather:
                v = jnp.take_along_axis(me, g, axis=1)
            else:
                v = me[:, :K]
            return c + v.sum(), ()

        c, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(REPS, dtype=jnp.int32)
        )
        return c

    for name, wg in (("baseline (slice)", False), ("take_along", True)):
        f = jax.jit(lambda k, wg=wg: run(k, wg))
        out = f(jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(jax.random.PRNGKey(2))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:20s} {dt:7.2f} ms  ({dt * 1e6 / (B * K):.2f} ns/q)",
              flush=True)


if __name__ == "__main__":
    main()
