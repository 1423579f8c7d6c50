"""Device-sharded hash membership: table shards + all_to_all query routing.

The replicated hash path (observables/pauli.py `_proxy_via_hash`) builds the
full (nb, 128) bucket table on every device: under GSPMD the scatter over
row-sharded samples turns into an all-reduce of the whole table, and every
device keeps a full copy. That is fine at today's batch sizes but caps the
sampled-set size at one chip's HBM.

Here each device OWNS ``nb/D`` contiguous buckets of the same planar layout:

- build: every device routes its (key, log|psi|, phase) sample entries to
  the bucket owner with one fixed-capacity ``all_to_all``; owners re-rank
  received entries per bucket and scatter them into their local shard;
- query: each device's (B/D, M) connected-key queries are routed to their
  owners the same way, answered with the local one-row-gather lookup, and
  routed back with a second ``all_to_all``.

Table memory, build scatters and lookup gathers all scale 1/D with the mesh;
the wire cost is two fixed-capacity all_to_alls riding ICI. Routing
capacities are sized for the uniform hash-key distribution with a slack
factor; overflow (Poisson tail) is counted in ``table_overflow`` exactly
like bucket overflow in the replicated path.

The reference has no distributed code at all (SURVEY.md section 2,
"Parallelism inventory") -- this is the TPU-native extension of the hash
membership design, validated bit-exact against the replicated path on the
8-device CPU mesh (tests/test_dist_membership.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# Plain python constant: a module-level jnp array would be created under
# whatever trace is active at first (lazy) import and leak that trace's
# tracer into every later call.
NEG = -1e30


def _rank_in_group(group: jnp.ndarray) -> jnp.ndarray:
    """Stable 0-based rank of each element among equal ``group`` values.

    Same trick as the replicated hash build: stable sort by group, then
    rank = position - segment start (max-scan over run-start positions).
    """
    n = group.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_g, sorted_i = jax.lax.sort(
        (group, iota), num_keys=1, is_stable=True
    )
    run_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_g[1:] != sorted_g[:-1]]
    )
    start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(run_start, iota, 0)
    )
    return jnp.zeros(n, jnp.int32).at[sorted_i].set(iota - start)


def hash_membership_dist(
    mesh,
    axis: str,
    words,  # (B, W) row-sharded over `axis`; W <= 4
    log_abs,  # (B,)
    phase,  # (B,)
    valid,  # (B,) bool
    a_words,  # (M, W) replicated flip masks
    *,
    epb: int = None,
    entry_slack: float = 4.0,
    query_slack: float = 1.5,
    lookup_chunk=None,
):
    """Distributed-table membership: (la_p, ph_p, overflow_count).

    Returns per-(sample, group) partner amplitudes with NEG marking
    misses, shaped (B, M) with the same row sharding as ``words``, plus a
    replicated overflow counter (bucket overflow + routing overflow).
    """
    from ..observables.pauli import PauliEngine

    bucket_hash = PauliEngine._bucket_hash
    neg = jnp.float32(NEG)

    d = mesh.shape[axis]
    b, w = words.shape
    m = a_words.shape[0]
    assert w <= 4, "hash membership supports <= 128 qubits"
    if epb is None:
        # Same planar 128-lane rows as the replicated build: 32 entries x
        # 4 fields for W <= 2, 16 entries x (W + 2) fields for W in (3, 4).
        epb = 32 if w <= 2 else 16
    nk = max(w, 2)  # stored key fields (1-word keys pad hi = 0)
    assert b % d == 0
    b_loc = b // d
    nb_total = 1 << max(8, (4 * b // epb - 1).bit_length(), d.bit_length())
    nb_local = nb_total // d
    shift_local = int(math.log2(nb_local))

    # Fixed routing capacities (uniform hash distribution + slack).
    cap_e = min(b_loc, -(-int(entry_slack * b_loc) // d))
    cap_e = max(8, -(-cap_e // 8) * 8)
    q_n = b_loc * m
    cap_q = min(q_n, int(query_slack * q_n / d))
    cap_q = max(128, -(-cap_q // 128) * 128)

    def shard_fn(words_s, log_abs_s, phase_s, valid_s, a_words_s):
        me = jax.lax.axis_index(axis).astype(jnp.int32)
        w_cols = PauliEngine._padded_cols(
            tuple(words_s[:, i] for i in range(w))
        )

        # ---- build: route entries to their bucket owner ----
        bucket = (
            bucket_hash(w_cols) & jnp.uint32(nb_total - 1)
        ).astype(jnp.int32)
        owner = jnp.where(valid_s, bucket >> shift_local, d)
        rank = _rank_in_group(owner)
        send_ovf_e = valid_s & (rank >= cap_e)
        slot = jnp.where(
            valid_s & ~send_ovf_e, owner * cap_e + rank, d * cap_e
        )
        buf_keys = tuple(
            jnp.zeros((d * cap_e,), jnp.uint32).at[slot].set(
                c, mode="drop"
            )
            for c in w_cols
        )
        buf_la = jnp.full((d * cap_e,), neg).at[slot].set(
            jnp.where(valid_s, log_abs_s, neg), mode="drop"
        )
        buf_ph = jnp.zeros((d * cap_e,), jnp.float32).at[slot].set(
            phase_s, mode="drop"
        )

        a2a = partial(
            jax.lax.all_to_all, axis_name=axis, split_axis=0,
            concat_axis=0, tiled=True,
        )
        r_keys = tuple(a2a(bk) for bk in buf_keys)
        r_la, r_ph = a2a(buf_la), a2a(buf_ph)

        # Owner-side build of the local (nb_local, 128) planar shard.
        r_valid = r_la > 0.5 * neg
        r_bucket = (
            bucket_hash(r_keys) & jnp.uint32(nb_total - 1)
        ).astype(jnp.int32)
        loc = jnp.where(r_valid, r_bucket - me * nb_local, nb_local)
        rank2 = _rank_in_group(loc)
        ovf_b = r_valid & (rank2 >= epb)
        row_i = jnp.where(r_valid & ~ovf_b, loc, nb_local)
        tab = jnp.full((nb_local, 128), neg, dtype=jnp.float32)
        for i, rk in enumerate(r_keys):
            tab = tab.at[row_i, rank2 + i * epb].set(
                jax.lax.bitcast_convert_type(rk, jnp.float32),
                mode="drop",
            )
        tab = tab.at[row_i, rank2 + nk * epb].set(
            jnp.where(r_valid, r_la, neg), mode="drop"
        )
        tab = tab.at[row_i, rank2 + (nk + 1) * epb].set(
            r_ph, mode="drop"
        )

        # ---- query: route connected keys to their owner ----
        xp_cols = PauliEngine._padded_cols(
            tuple(
                (words_s[:, i][:, None] ^ a_words_s[:, i][None, :])
                .reshape(-1)
                for i in range(w)
            )
        )
        q_bucket = (
            bucket_hash(xp_cols) & jnp.uint32(nb_total - 1)
        ).astype(jnp.int32)
        owner_q = q_bucket >> shift_local
        rank_q = _rank_in_group(owner_q)
        ovf_q = rank_q >= cap_q
        slot_q = jnp.where(ovf_q, d * cap_q, owner_q * cap_q + rank_q)
        qbufs = tuple(
            jnp.zeros((d * cap_q,), jnp.uint32).at[slot_q].set(
                c, mode="drop"
            )
            for c in xp_cols
        )
        rq_cols = tuple(a2a(qb) for qb in qbufs)

        def lookup(*qs):
            loc_q = (
                bucket_hash(qs) & jnp.uint32(nb_total - 1)
            ).astype(jnp.int32) - me * nb_local
            # Padding slots hash to buckets outside this shard: OOB rows
            # gather as NEG -> miss.
            rows_g = tab.at[loc_q].get(mode="fill", fill_value=-1e30)
            la_e = rows_g[..., nk * epb : (nk + 1) * epb]
            match = la_e > 0.5 * neg
            for i, q in enumerate(qs):
                keys_i = jax.lax.bitcast_convert_type(
                    rows_g[..., i * epb : (i + 1) * epb], jnp.uint32
                )
                match = match & (keys_i == q[..., None])
            la = jnp.sum(jnp.where(match, la_e, 0.0), axis=-1)
            ph = jnp.sum(
                jnp.where(
                    match,
                    rows_g[..., (nk + 1) * epb : (nk + 2) * epb],
                    0.0,
                ),
                axis=-1,
            )
            return jnp.where(jnp.any(match, axis=-1), la, neg), ph

        if lookup_chunk is not None and d * cap_q > lookup_chunk:
            n_q = d * cap_q
            pad = (-n_q) % lookup_chunk
            stacked = tuple(
                jnp.pad(x, (0, pad)).reshape(-1, lookup_chunk)
                for x in rq_cols
            )
            outs = jax.lax.map(lambda t: lookup(*t), stacked)
            ans_la, ans_ph = (o.reshape(-1)[:n_q] for o in outs)
        else:
            ans_la, ans_ph = lookup(*rq_cols)

        # Route answers back; they land in the sender's slot layout.
        back_la, back_ph = a2a(ans_la), a2a(ans_ph)
        safe_slot = jnp.clip(slot_q, 0, d * cap_q - 1)
        la_p = jnp.where(ovf_q, neg, back_la[safe_slot])
        ph_p = jnp.where(ovf_q, 0.0, back_ph[safe_slot])

        overflow = jax.lax.psum(
            jnp.sum(send_ovf_e).astype(jnp.int32)
            + jnp.sum(ovf_b).astype(jnp.int32)
            + jnp.sum(ovf_q).astype(jnp.int32),
            axis,
        )
        return (
            la_p.reshape(b_loc, m), ph_p.reshape(b_loc, m), overflow
        )

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis), P(None, None)),
        out_specs=(P(axis, None), P(axis, None), P()),
        check_vma=False,
    )(words, log_abs, phase, valid, a_words)
