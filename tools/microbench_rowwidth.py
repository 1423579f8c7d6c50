"""Row-gather cost vs row width (lanes), plus realistic compact-bucket
hash lookups. Decides the bucket layout for membership tables."""
import time
import jax
import jax.numpy as jnp
import numpy as np

REPS = 10
Q = 8192 * 3072  # 25.2M


def timed(fn, *args):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jitted(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3


def scan_over(body, init_carry, *tables):
    def run(carry, *tabs):
        def f(c, i):
            return body(c, i, *tabs), ()
        c, _ = jax.lax.scan(f, carry, jnp.arange(REPS, dtype=jnp.uint32))
        return c
    return run, init_carry, tables


def main():
    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    qbase = jnp.asarray(
        rng.integers(0, 1 << 31, size=(Q,), dtype=np.int64).astype(np.uint32)
    )
    nb = 8192

    for lanes in (8, 16, 32, 64, 128):
        rows = jnp.asarray(rng.standard_normal((nb, lanes)), jnp.float32)

        def body(c, i, rows_):
            idx = ((qbase ^ c) % jnp.uint32(nb)).astype(jnp.int32)
            g = rows_[idx]
            return c + jnp.uint32(1) + (g[0, 0] > 1e30).astype(jnp.uint32)

        run, c0, tabs = scan_over(body, jnp.uint32(1), rows)
        ms = timed(run, c0, *tabs)
        print(f"rowgather[{lanes:3d} lanes] {Q/1e6:.1f}M: {ms:8.2f} ms "
              f"({ms*1e6/Q:.2f} ns/q, {Q*lanes*4/ms*1e3/1e9:.0f} GB/s)",
              flush=True)

    # Realistic compact hash lookup: gather (Q, 32) bucket, compare 8 key
    # pairs, select la/ph -- the full combine per query.
    rows = jnp.asarray(rng.standard_normal((nb, 32)), jnp.float32)

    def body_lookup(c, i, rows_):
        q_lo = qbase ^ c
        q_hi = q_lo * jnp.uint32(7)
        idx = (q_lo % jnp.uint32(nb)).astype(jnp.int32)
        g = rows_[idx]  # (Q, 32)
        k_lo = jax.lax.bitcast_convert_type(g[:, 0:8], jnp.uint32)
        k_hi = jax.lax.bitcast_convert_type(g[:, 8:16], jnp.uint32)
        la_e = g[:, 16:24]
        match = (k_lo == q_lo[:, None]) & (k_hi == q_hi[:, None]) & (
            la_e > -1e29
        )
        la = jnp.sum(jnp.where(match, la_e, 0.0), axis=-1)
        ph = jnp.sum(jnp.where(match, g[:, 24:32], 0.0), axis=-1)
        la = jnp.where(jnp.any(match, axis=-1), la, -1e30)
        return c + jnp.uint32(1) + (la[0] > 1e29).astype(jnp.uint32) + (
            ph[0] > 1e29
        ).astype(jnp.uint32)

    run, c0, tabs = scan_over(body_lookup, jnp.uint32(1), rows)
    ms = timed(run, c0, *tabs)
    print(f"full compact-hash lookup [32 lanes]: {ms:8.2f} ms", flush=True)

    # Same with the current 128-lane layout for reference.
    rows128 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)

    def body_lookup128(c, i, rows_):
        q_lo = qbase ^ c
        q_hi = q_lo * jnp.uint32(7)
        idx = (q_lo % jnp.uint32(nb)).astype(jnp.int32)
        g = rows_[idx]
        k_lo = jax.lax.bitcast_convert_type(g[:, 0:32], jnp.uint32)
        k_hi = jax.lax.bitcast_convert_type(g[:, 32:64], jnp.uint32)
        la_e = g[:, 64:96]
        match = (k_lo == q_lo[:, None]) & (k_hi == q_hi[:, None]) & (
            la_e > -1e29
        )
        la = jnp.sum(jnp.where(match, la_e, 0.0), axis=-1)
        ph = jnp.sum(jnp.where(match, g[:, 96:128], 0.0), axis=-1)
        la = jnp.where(jnp.any(match, axis=-1), la, -1e30)
        return c + jnp.uint32(1) + (la[0] > 1e29).astype(jnp.uint32) + (
            ph[0] > 1e29
        ).astype(jnp.uint32)

    run, c0, tabs = scan_over(body_lookup128, jnp.uint32(1), rows128)
    ms = timed(run, c0, *tabs)
    print(f"full planar-hash lookup [128 lanes]: {ms:8.2f} ms", flush=True)

    # Direct-address compact row: 4 interleaved (la, ph) pairs per 8-lane
    # row vs the current 64-pairs-per-128-lane layout.
    n_keys = 1 << 20
    for lanes, kpr in ((8, 4), (128, 64)):
        tab = jnp.asarray(
            rng.standard_normal((n_keys // kpr, lanes)), jnp.float32
        )

        def body_da(c, i, tab_):
            q = (qbase ^ c) % jnp.uint32(n_keys)
            qr = (q // jnp.uint32(kpr)).astype(jnp.int32)
            g = tab_[qr]
            qc = ((q % jnp.uint32(kpr)) * 2).astype(jnp.int32)
            sel_la = jax.nn.one_hot(qc, lanes, dtype=jnp.float32)
            sel_ph = jax.nn.one_hot(qc + 1, lanes, dtype=jnp.float32)
            la = jnp.sum(g * sel_la, axis=-1)
            ph = jnp.sum(g * sel_ph, axis=-1)
            return c + jnp.uint32(1) + (la[0] > 1e29).astype(jnp.uint32) + (
                ph[0] > 1e29
            ).astype(jnp.uint32)

        run, c0, tabs = scan_over(body_da, jnp.uint32(1), tab)
        ms = timed(run, c0, *tabs)
        print(f"direct-address lookup [{lanes} lanes, {kpr} keys/row]: "
              f"{ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
