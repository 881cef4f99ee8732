"""In-kernel stitch compaction: dense token stream without the XLA scatter.

ops/stitch.py::device_stitch materialises the dense id stream with a
491k-element XLA scatter (~15.6 ms/MB measured, the largest single phase of
the round-3 pipeline).  Here the junction search stays XLA (cheap vector
compares) but the compaction becomes a Pallas kernel: lanes are processed
sequentially, each lane's token stream is rotated to its global output
offset with dynamic lane/sublane rolls and merged into the dense output
with masked read-modify-write stores at a dynamic row offset (both
verified exact on this hardware, .tmp/exp_r4_mxu.py E2/E5).

Fast-path precondition: every kept record emits exactly one output slot.
The follow kernel folds delete emission into bit 22 of the token word
(resolved to "id + delete_token" on the host), so the only non-emitting
records are missing bytes in vocabularies without an unk token; those
dispatches report sync_ok=False and take the exact host-stitch fallback.

Junction semantics are identical to ops/stitch.py (the automaton state at
every emission is (position, forwardDelete); any state shared by
neighbouring lanes is an exact splice point, go/tokenmonster.go:1048-1277).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scan import _REC_DEL, _REC_MISS, _REC_TOK
from .stitch import SYNC_PROBE, stitched_keep

DEL_BIT = 1 << 22   # "delete token follows" marker in the packed token word


def make_compact_kernel(n_lanes: int, t_rec: int, cap_rows: int,
                        interpret: bool = False):
    """fn(toksT u32 (n_lanes*rpl, 128), s/e/q i32[n_lanes]) ->
    out u32 (cap_rows + 2*rpl, 128).

    toksT row l*rpl + r, lane c = record r*128+c of lane l (lane-major
    streams).  For each lane the kept records j in [s_l, e_l] land at
    global slots q_l + j (q_l = lane output offset - s_l); the kernel
    rotates the lane's stream by q_l mod 128 lanes (+ row carry) and
    merges it into the output rows at q_l >> 7 under the keep mask."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert t_rec % 128 == 0
    rpl = t_rec // 128          # rows per lane
    LEAD = 8                    # leading margin rows: q can be down to
                                # -SYNC_PROBE (start_rec skip), row0 >= -1
    out_rows = LEAD + cap_rows + 2 * rpl

    def kernel(s_ref, e_ref, q_ref, toks_ref, out_ref):
        zero_blk = jnp.zeros((8, 128), jnp.uint32)

        def zero_body(i, _):
            out_ref[pl.ds(i * 8, 8), :] = zero_blk
            return 0

        jax.lax.fori_loop(0, out_rows // 8, zero_body, 0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (rpl, 128), 1)
        grow = jax.lax.broadcasted_iota(jnp.int32, (rpl, 128), 0)
        grow2 = jax.lax.broadcasted_iota(jnp.int32, (2 * rpl, 128), 0)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (2 * rpl, 128), 1)

        def body(l, _):
            s = s_ref[l]
            e = e_ref[l]
            q = q_ref[l]
            rot = q & 127          # two's complement: exact mod-128 for q<0
            row0 = q >> 7          # arithmetic shift: floor division
            blk = toks_ref[pl.ds(l * rpl, rpl), :]
            # linear right-shift of the 128*rpl-record stream by rot:
            # cyclic lane roll + row-carry of the wrapped lanes
            rolled = pltpu.roll(blk, rot, 1)
            main = jnp.where(lane >= rot, rolled, 0)
            carry = jnp.where(lane < rot, rolled, 0)
            cdown = pltpu.roll(carry, 1, 0)      # row r <- carry of row r-1
            first = main | jnp.where(grow >= 1, cdown, 0)
            second = jnp.where(grow == 0, cdown, 0)  # carry of last row
            B = jnp.concatenate([first, second], axis=0)   # (2*rpl, 128)
            # element (R, c) holds record j = R*128 + c - rot, written to
            # global slot q + j  (q = row0*128 + rot)
            j = grow2 * 128 + lane2 - rot
            mask = (j >= s) & (j <= e) & (j < t_rec)
            cur = out_ref[pl.ds(LEAD + row0, 2 * rpl), :]
            out_ref[pl.ds(LEAD + row0, 2 * rpl), :] = jnp.where(mask, B, cur)
            return 0

        jax.lax.fori_loop(0, n_lanes, body, 0)

    @jax.jit
    def compact(toksT, s, e, q):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(s, e, q, toksT)
        return out.reshape(-1)[LEAD * 128:]

    return compact


def device_stitch_compact(recs, toksT, start0, last_lane, final,
                          compact_fn, out_cap: int, probe: int = SYNC_PROBE):
    """Stitch + compact with the Pallas kernel.  recs: (T, L) step records
    (for the junction search); toksT: lane-major token words incl. DEL_BIT.
    Returns (out u32[out_cap], count, missing, start_next, sync_ok);
    sync_ok is False (exact host fallback) when a junction failed OR a kept
    record emits nothing (missing byte without unk)."""
    T, L = recs.shape
    flags, keep, start_next, sync_ok, start_rec, end_rec = stitched_keep(
        recs, start0, last_lane, final, probe, want_ranges=True)
    emits = (flags & (_REC_TOK | _REC_DEL)) != 0
    fast_ok = ~jnp.any(keep & ~emits)
    counts = keep.sum(axis=0).astype(jnp.int32)              # (L,)
    missing = (((flags & _REC_MISS) != 0) & keep).sum().astype(jnp.int32)
    ends = jnp.cumsum(counts)
    total = ends[-1]
    offs = ends - counts
    q = offs - start_rec        # >= -probe; the kernel has a lead margin
    out = compact_fn(toksT, start_rec, jnp.minimum(end_rec, T - 1), q)
    return (out[:out_cap], total, missing, start_next,
            sync_ok & fast_ok)
