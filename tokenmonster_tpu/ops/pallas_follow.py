"""Pallas follow kernel: chain-follow the decision table per chunk lane.

Replaces ops/decision.py::follow_lanes for the Pallas engine.  The XLA
while_loop pays ~17 us/iteration in per-step overhead and HBM gathers
(~12 ms/MB); here every lane's window of the packed decision table sits in
VMEM as one contiguous per-group block, and one step is a HALVING
ROW-SELECT by the lane's position (ops/pallas_gather.row_select — ~W rows
of where-select per step instead of the round-4 one-hot page scan's ~4x
pages*128 rows).

Forward-delete vocabularies carry BOTH decision rows (fd = 0 and fd = 1):
the per-group block holds the two rows back to back (fd-major) and each
step's select index is fd*W + pos_rel — the exact chain of
ops/decision.py::follow_lanes (go/tokenmonster.go:1048-1277 restructured).

Hard-won layout rules (this Mosaic version):
  - narrow 2D shapes ((128, 4) state vectors) MISCOMPILE and can crash the
    TPU worker — all state lives in (8, 128) arrays: row g = lane group g,
    lane r = lane_id r*LG+g (rows LG..7 start done)
  - the window blocks are HOST-TRANSPOSED to (pos, lane) orientation so the
    row-select runs along sublanes — no in-kernel transposes, no narrow ops
  - output stores pair two steps into one (8, 128) block so the sublane
    offset stays 8-aligned

Contract matches follow_lanes(packed=True): rec = (global_pos << 4) |
fd' | has_tok<<1 | has_del<<2 | miss<<3, tok = the 22-bit packed idx|w3
word; outputs (t_rec, L) after an XLA reshape; plus an all-lanes-done flag
for the stitch's record-window overflow check.

Lane count: any multiple of 128 up to 512 (LG = n_lanes // 128 lane
groups; rows LG..7 of the state arrays are permanently done).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _geom(chunk: int, overlap: int):
    W = -(-(chunk + overlap + 128) // 128) * 128
    return W, W // 128


def make_follow_kernel(chunk: int, n_lanes: int, overlap: int, t_rec: int,
                       two_rows: bool = False, interpret: bool = False):
    """fn(blocksT u32 (n_rows*n_pages*LG*128, 128), n) ->
    (recs u32 (t_rec, L), toks u32 (t_rec, L), done_all i32 scalar).

    blocksT row ((g*F + f)*n_pages + k)*128 + p = in-page position p of
    page k of decision row f for the 128 lanes of group g — one contiguous
    fd-major window block per group (build_lane_windows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_lanes % 128 == 0 and 1 <= n_lanes // 128 <= 4, \
        "pallas follow expects 128..512 lanes in multiples of 128"
    assert t_rec % 2 == 0
    LG = n_lanes // 128
    W, n_pages = _geom(chunk, overlap)
    n_sel_pages = n_pages * (2 if two_rows else 1)

    def kernel(n_ref, blocks_ref, recs_ref, toks_ref, done_ref):
        n_valid = n_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        grow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane_id = lane * LG + grow
        start_abs = lane_id * chunk
        stop_rel = jnp.where(grow < LG,
                             jnp.clip(n_valid - start_abs, -1,
                                      chunk + overlap),
                             0)

        def lookup(pos_rel, fd):
            """w (8,128): row g = window word at (fd, pos_rel) for group g.

            Group g's window is one contiguous (F*W, 128) block (fd-major);
            the fetch is a halving row-select (ops/pallas_gather.row_select,
            ~F*W rows of where-select instead of the round-4 one-hot page
            scan's ~4x page*128 rows)."""
            from .pallas_gather import row_select
            rows = []
            for g in range(LG):
                G = blocks_ref[pl.ds(g * n_sel_pages * 128,
                                     n_sel_pages * 128), :]
                idx = pos_rel[g:g + 1, :]
                if two_rows:
                    idx = idx + fd[g:g + 1, :] * W
                rows.append(row_select(G, idx, n_sel_pages * 128))
            rows += [jnp.zeros((1, 128), jnp.uint32)] * (8 - LG)
            return jnp.concatenate(rows, axis=0)       # (8, 128)

        def one_step(pos_rel, fd, done):
            w = lookup(jnp.clip(pos_rel, 0, W - 1), fd)
            delta = (w & 63).astype(jnp.int32)
            new_fd = ((w >> 6) & 1).astype(jnp.int32)
            has_tok = ((w >> 7) & 1).astype(jnp.uint32)
            has_del = ((w >> 8) & 1).astype(jnp.uint32)
            miss = ((w >> 9) & 1).astype(jnp.uint32)
            tok = (w >> 10).astype(jnp.uint32)
            new_rel = pos_rel + delta
            live = done == 0
            rec = (((start_abs + new_rel).astype(jnp.uint32) << 4)
                   | new_fd.astype(jnp.uint32)
                   | (has_tok << 1) | (has_del << 2) | (miss << 3))
            rec = jnp.where(live, rec, 0)
            tok = jnp.where(live, tok, 0)
            new_done = jnp.where(new_rel >= stop_rel, 1, done)
            new_rel = jnp.where(live, new_rel, pos_rel)
            new_fd = jnp.where(live, new_fd, fd)
            return rec, tok, new_rel, new_fd, new_done

        def cond(state):
            mt, pos_rel, fd, done, alldone = state
            return (mt < t_rec // 2) & (alldone == 0)

        def body(state):
            mt, pos_rel, fd, done, _ = state
            rec0, tok0, pos_rel, fd, done = one_step(pos_rel, fd, done)
            rec1, tok1, pos_rel, fd, done = one_step(pos_rel, fd, done)
            # rows 0..LG-1 = step 2*mt, rows LG..2LG-1 = step 2*mt+1
            sel = grow < LG
            rec = jnp.where(sel, rec0, pltpu.roll(rec1, LG, 0))
            tok = jnp.where(sel, tok0, pltpu.roll(tok1, LG, 0))
            recs_ref[pl.ds(mt * 8, 8), :] = rec
            toks_ref[pl.ds(mt * 8, 8), :] = tok
            alldone = jnp.all(done == 1).astype(jnp.int32)
            return (mt + 1, pos_rel, fd, done, alldone)

        pos0 = jnp.zeros((8, 128), jnp.int32)
        fd0 = jnp.zeros((8, 128), jnp.int32)
        done0 = jnp.where(stop_rel <= 0, 1, 0)
        # early exit once every lane is done (typical text fills ~55% of the
        # worst-case record window); the tail is zeroed below so the stitch
        # sees flags==0 invalid records there
        mt_f, _pos_f, _fd_f, done_f, _ad = jax.lax.while_loop(
            cond, body, (jnp.int32(0), pos0, fd0, done0,
                         jnp.all(done0 == 1).astype(jnp.int32)))
        zero8 = jnp.zeros((8, 128), jnp.uint32)

        def zcond(mt):
            return mt < t_rec // 2

        def zbody(mt):
            recs_ref[pl.ds(mt * 8, 8), :] = zero8
            toks_ref[pl.ds(mt * 8, 8), :] = zero8
            return mt + 1

        jax.lax.while_loop(zcond, zbody, mt_f)
        done_ref[0] = jnp.all(done_f == 1).astype(jnp.int32)

    L = n_lanes

    @jax.jit
    def follow(blocksT, n):
        recs, toks, done_all = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((t_rec * 4, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((t_rec * 4, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((1,), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            interpret=interpret,
        )(jnp.asarray(n, jnp.int32).reshape(1), blocksT)
        # stored macro mt -> rows [mt*8, mt*8+8): rows 0..LG-1 = step 2mt,
        # rows LG..2LG-1 = step 2mt+1; row g lane r = lane r*LG+g
        def fix(a):
            a = jax.lax.bitcast_convert_type(a, jnp.int32)
            a = a.reshape(t_rec // 2, 8, 128)[:, :2 * LG, :]
            a = a.reshape(t_rec // 2, 2, LG, 128)
            a = a.transpose(0, 1, 3, 2)       # (mt, sub, lane_r, g)
            return jax.lax.bitcast_convert_type(a.reshape(t_rec, L),
                                                jnp.uint32)
        return fix(recs), fix(toks), done_all[0]

    return follow


def build_lane_windows(ctl_packed, chunk: int, n_lanes: int, overlap: int):
    """Host/XLA side table prep: (n_rows*n_pages*LG*128, 128) u32 where row
    ((g*F+f)*n_pages+k)*128 + p holds in-page position p of page k of
    decision row f for group g's 128 lanes (lane_id = r*LG + g in lane r).

    ctl_packed: (P,) for a single decision row, or (n_rows, P) — the fd
    rows of ops/decision.py::decision_tables — stacked along pages."""
    LG = n_lanes // 128
    W, n_pages = _geom(chunk, overlap)
    if ctl_packed.ndim == 1:
        ctl_packed = ctl_packed[None, :]
    F, P = ctl_packed.shape
    need = n_lanes * chunk + W
    ext = jnp.concatenate(
        [ctl_packed,
         jnp.zeros((F, max(0, need - P)), ctl_packed.dtype)], axis=1)
    parts = []
    got = 0
    off = 0
    while got < W:
        part = ext[:, off:off + n_lanes * chunk].reshape(F, n_lanes, chunk)
        parts.append(part[:, :, :min(chunk, W - got)])
        got += parts[-1].shape[2]
        off += chunk
    nat = jnp.concatenate(parts, axis=2)                 # (F, L, W) natural
    # lane l = r*LG+g  ->  (g, r); pages along W; per group one contiguous
    # fd-major block (the follow kernel's halving row-select wants
    # idx = fd*W + pos_rel linear within the group's block).
    # (i32 bitcast: XLA's u32 transpose lowers ~40% slower than i32)
    by_g = jax.lax.bitcast_convert_type(nat, jnp.int32) \
        .reshape(F, 128, LG, n_pages, 128)               # (f, r, g, k, p)
    blocksT = by_g.transpose(2, 0, 3, 4, 1)              # (g, f, k, p, r)
    return jax.lax.bitcast_convert_type(
        blocksT.reshape(F * n_pages * LG * 128, 128), jnp.uint32)
