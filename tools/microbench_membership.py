"""v5e micro-benchmarks for the membership-lookup design space.

Honest protocol (DESIGN_NOTES): each candidate op runs as its own jitted
lax.scan over `reps` repetitions with evolving inputs, so the axon replay
cache cannot serve results. All tables ride as jit arguments.

Run on the real TPU: python tools/microbench_membership.py
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPS = 10
B, M = 8192, 3072          # Li2O-scale query grid
Q = B * M                  # 25.2M queries


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

    # --- 1-element f32 gathers from tables of various sizes.
    for log_size in (15, 20, 22, 24):
        size = 1 << log_size
        tab = jnp.asarray(rng.standard_normal(size), jnp.float32)

        def body(c, i, tab_):
            idx = ((qbase ^ c) % jnp.uint32(size)).astype(jnp.int32)
            vals = tab_[idx]
            return c + jnp.uint32(1) + (vals[0] > 1e30).astype(jnp.uint32)

        run, c0, tabs = scan_over(body, jnp.uint32(1), tab)
        ms = timed(run, c0, *tabs)
        print(f"gather1d[2^{log_size}] {Q/1e6:.1f}M: {ms:8.2f} ms "
              f"({ms*1e6/Q:.2f} ns/q)", flush=True)

    # --- bit-packed bloom probe: gather uint32 word + bit test (2^22 bits).
    words = 1 << 17
    bloom = jnp.asarray(
        rng.integers(0, 1 << 31, size=(words,), dtype=np.int64).astype(np.uint32)
    )

    def body_bloom(c, i, bl):
        h = (qbase ^ c) * jnp.uint32(2654435761)
        h = h ^ (h >> jnp.uint32(15))
        idx = ((h >> jnp.uint32(5)) % jnp.uint32(words)).astype(jnp.int32)
        w = bl[idx]
        hit = (w >> (h & jnp.uint32(31))) & jnp.uint32(1)
        return c + jnp.uint32(1) + hit[0]

    run, c0, tabs = scan_over(body_bloom, jnp.uint32(1), bloom)
    ms = timed(run, c0, *tabs)
    print(f"bloom-bit[2^22 bits] {Q/1e6:.1f}M: {ms:8.2f} ms "
          f"({ms*1e6/Q:.2f} ns/q)", flush=True)

    # --- 128-lane row gather (current hash-row cost) at the same Q.
    nb = 1 << 13
    rows = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)

    def body_row(c, i, rows_):
        idx = ((qbase ^ c) % jnp.uint32(nb)).astype(jnp.int32)
        g = rows_[idx]  # (Q, 128)
        return c + jnp.uint32(1) + (g[0, 0] > 1e30).astype(jnp.uint32)

    run, c0, tabs = scan_over(body_row, jnp.uint32(1), rows)
    ms = timed(run, c0, *tabs)
    print(f"rowgather128[{nb} rows] {Q/1e6:.1f}M: {ms:8.2f} ms "
          f"({ms*1e6/Q:.2f} ns/q)", flush=True)

    # --- top_k over (B, M) int32, k in {64, 256}.
    keys0 = jnp.asarray(
        rng.integers(0, M, size=(B, M), dtype=np.int64).astype(np.int32)
    )
    for k in (64, 256):
        def body_topk(c, i, km):
            vals, idx = jax.lax.top_k(km ^ c.astype(jnp.int32), k)
            return c + jnp.uint32(1) + (vals[0, 0] < -1).astype(jnp.uint32)

        run, c0, tabs = scan_over(body_topk, jnp.uint32(1), keys0)
        ms = timed(run, c0, *tabs)
        print(f"top_k[{B}x{M}, k={k}]: {ms:8.2f} ms", flush=True)

    # --- take_along_axis (B, M) f32 with (B, 64) indices.
    mat = jnp.asarray(rng.standard_normal((B, M)), jnp.float32)
    idx64 = jnp.asarray(
        rng.integers(0, M, size=(B, 64), dtype=np.int64).astype(np.int32)
    )

    def body_taa(c, i, mat_, idx_):
        sel = jnp.take_along_axis(mat_, (idx_ + c.astype(jnp.int32)) % M,
                                  axis=1)
        return c + jnp.uint32(1) + (sel[0, 0] > 1e30).astype(jnp.uint32)

    run, c0, tabs = scan_over(body_taa, jnp.uint32(1), mat, idx64)
    ms = timed(run, c0, *tabs)
    print(f"take_along_axis[{B}x{M} -> {B}x64]: {ms:8.2f} ms", flush=True)

    # --- cumsum over 25M int32.
    flags = jnp.asarray(
        rng.integers(0, 2, size=(Q,), dtype=np.int64).astype(np.int32)
    )

    def body_cumsum(c, i, f_):
        s = jnp.cumsum(f_ ^ c.astype(jnp.int32))
        return c + jnp.uint32(1) + (s[-1] < -1).astype(jnp.uint32)

    run, c0, tabs = scan_over(body_cumsum, jnp.uint32(1), flags)
    ms = timed(run, c0, *tabs)
    print(f"cumsum[{Q/1e6:.1f}M int32]: {ms:8.2f} ms", flush=True)

    # --- scatter 25M int32 set into (C,) buffer (compaction cost probe).
    cap = 1 << 18
    pos0 = jnp.asarray(
        rng.integers(0, 1 << 30, size=(Q,), dtype=np.int64).astype(np.int32)
    )

    def body_scat(c, i, p_):
        pos = (p_ ^ c.astype(jnp.int32)) % (cap * 64)
        buf = jnp.zeros((cap,), jnp.int32).at[pos].set(
            jnp.arange(Q, dtype=jnp.int32), mode="drop"
        )
        return c + jnp.uint32(1) + (buf[0] < -1).astype(jnp.uint32)

    run, c0, tabs = scan_over(body_scat, jnp.uint32(1), pos0)
    ms = timed(run, c0, *tabs)
    print(f"scatter[{Q/1e6:.1f}M -> 2^18 buf]: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
