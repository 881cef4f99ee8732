"""Pallas decision kernel: the 6-branch ungreedy transition for every
position, computed from the match tables (ops/pallas_match.py output).

Replaces the XLA dense decision engine (ops/decision.py), whose bounded-
offset window lookups lower to 48-way select trees and whose per-token
metadata needs HBM row-gathers (~61 ms/MB measured).  In-kernel, a window
lookup tab[p + delta] (delta < 96) is two take_along_axis lane-shuffles +
a select, and per-token metadata is fetched once per position from VMEM
meta planes keyed by dictionary index (select-sum over ~400 rows).

Scoring math is the exact reference formula (go/tokenmonster.go:1075-1084,
tie order :1132-1133, fast path :1057; forward-delete branches
:1088-1108) — mirrored from ops/scan.py::ungreedy_step's dense branch and
tested against it.

Delete-token vocabularies (capcode levels 1/2 — everything the trainer
produces) get BOTH forward-delete rows: the kernel consumes the
space-prefixed match table mb_tab and emits the (2, N) decision tables of
ops/decision.py::decision_tables.  Vocabularies without a delete token
emit the single fd=0 row.

Outputs (ctl, tok) in the ops/decision.py contract:
  ctl = delta(6b) | fd'<<6 | has_tok<<7 | has_del<<8 | miss<<9
  tok = dict idx (20b) | branch w3 (2b) << 20 — fits the follow phase's
        packed 22-bit token field; the stitch output resolves idx+branch to
        the emitted id with one host gather per record (resolve_tokens).
        w3 == 3 marks a literal id in the low 20 bits (unk emission and the
        stitch's delete-token filler).  Vocabularies with >= 2^20 entries
        route through the XLA engine.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

TILE_ROWS = 16        # position rows per grid step (margin amortisation:
                      # the EXTRA_ROWS overlap is paid once per tile)
TILE_ROWS_FD = 16     # two-fd-row variant: tile 16 fits since round 5's
                      # grid-blocked outputs (the round-4 resident outputs
                      # measured 17.44M > 16M scoped VMEM on v5e)
EXTRA_ROWS = 2        # window lookups reach delta <= 95 plus row carry

NEG = -1000000
W3_SHIFT = 20


def build_meta_planes(vocab):
    """Per-token metadata planes keyed by dictionary index (idx -> row
    idx>>7, lane idx&127).  Packed i32 (full 32 bits per plane — two
    select-sum fetches per position instead of the three the f32-exact
    24-bit layout needed):
      0: flag | nwords<<8 | len1<<16 | len2<<24
      1: aflag1 | anw1<<8 | aflag2<<16 | anw2<<24
    Returns (planes (2, R, 128) i32, bb_plane (2,128) f32)."""
    n = len(vocab.tokens)
    i1c = np.minimum(vocab.index1.astype(np.int64), max(n - 1, 0))
    i2c = np.minimum(vocab.index2.astype(np.int64), max(n - 1, 0))
    has1 = vocab.len1 > 0
    has2 = vocab.len2 > 0
    af1 = np.where(has1, vocab.flag[i1c], 0).astype(np.int64)
    anw1 = np.where(has1, vocab.nwords[i1c], 0).astype(np.int64)
    af2 = np.where(has2, vocab.flag[i2c], 0).astype(np.int64)
    anw2 = np.where(has2, vocab.nwords[i2c], 0).astype(np.int64)
    f0 = (vocab.flag.astype(np.int64)
          | (vocab.nwords.astype(np.int64) << 8)
          | (vocab.len1.astype(np.int64) << 16)
          | (vocab.len2.astype(np.int64) << 24))
    f1 = af1 | (anw1 << 8) | (af2 << 16) | (anw2 << 24)
    R = max(8, -(-n // 128 // 8) * 8)
    planes = np.zeros((2, R, 128), np.int32)
    for j, f in enumerate((f0, f1)):
        p = np.zeros(R * 128, np.int32)
        p[:n] = f.astype(np.int32)
        planes[j] = p.reshape(R, 128)
    bb = np.zeros(256, np.float32)
    bb[:] = vocab.begin_byte.astype(np.float32)
    return planes, bb.reshape(2, 128)


def make_decide_kernel(vocab, interpret: bool = False,
                       meta_rows: int | None = None):
    """Delete-free vocab: fn(m_tab u32[N], text u8[N], n) -> (ctl u32[N],
    tok u32[N]).  Delete-token vocab: fn(m_tab, mb_tab, text, n) ->
    (ctl u32[2, N], tok u32[2, N]) — row fd.

    N a multiple of 128*TILE_ROWS; m_tab/mb_tab/text padded with >= 2*128
    zero entries past real data (appended margin rows are added here).

    ``meta_rows`` overrides the meta-plane row count: the trainer's
    big-superset mode remaps match indices to candidate-local ranks on
    device and passes CANDIDATE-sized planes at runtime (the halving meta
    fetch register-spills past a few thousand rows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    planes_np, bb_np = build_meta_planes(vocab)
    planes = jnp.asarray(planes_np)
    bb_tbl = jnp.asarray(bb_np)
    has_unk = vocab.unk_token != 0xFFFFFF
    unk_token = int(vocab.unk_token) & 0xFFFFFF
    has_delete = vocab.delete_token != 0xFFFFFF
    lil_off = 2 if vocab.charset == 2 else 1
    TILE = TILE_ROWS_FD if has_delete else TILE_ROWS
    R2 = TILE + EXTRA_ROWS
    PR = meta_rows if meta_rows is not None else planes_np.shape[1]
    if meta_rows is not None:
        R_LOG = meta_rows
    else:
        R_LOG = max(1, -(-len(vocab.tokens) // 128))  # logical meta rows

    def kernel(n_ref, *refs):
        if has_delete:
            m_ref, mb_ref, t_ref, planes_ref, bb_ref = refs[:5]
            out_refs = refs[5:]            # ctl0, tok0, ctl1, tok1
        else:
            m_ref, t_ref, planes_ref, bb_ref = refs[:4]
            out_refs = refs[4:]            # ctl0, tok0
        step = pl.program_id(0)
        base_row = step * TILE
        m = m_ref[pl.ds(base_row, R2), :].astype(jnp.int32)
        t = t_ref[pl.ds(base_row, R2), :].astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R2, 128), 1)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (R2, 128), 0)
        pos_abs = (base_row + rowi) * 128 + lane
        n_valid = n_ref[0]

        def win(arr, delta):
            """arr[p + delta] for delta in [0, 96): two lane-shuffles over
            the row and its successor + select (rows beyond R2-1 wrap to
            garbage but only margin rows read them)."""
            d = jnp.clip(delta, 0, 127)
            nxt = pltpu.roll(arr, R2 - 1, 0)
            i1 = (lane + d) & 127
            a = jnp.take_along_axis(arr, i1, axis=1)
            b = jnp.take_along_axis(nxt, i1, axis=1)
            return jnp.where(lane + d < 128, a, b)

        def meta_fetch2(idx):
            """[planes[0][idx], planes[1][idx]] per 128-position group —
            shared lane-shuffle indices + halving row-select
            (ops/pallas_gather.py)."""
            from .pallas_gather import fetch_planes
            return fetch_planes([planes_ref[0], planes_ref[1]],
                                idx >> 7, idx & 127, R_LOG, R2)

        # begin-byte classes for every byte
        b_all = bb_ref[:]
        bb0 = jnp.take_along_axis(
            jnp.broadcast_to(b_all[0:1, :], (R2, 128)), t & 127, axis=1)
        bb1 = jnp.take_along_axis(
            jnp.broadcast_to(b_all[1:2, :], (R2, 128)), t & 127, axis=1)
        bb = jnp.where(t < 128, bb0, bb1).astype(jnp.int32)

        # per-position metadata streams for both match tables (the branch
        # lookaheads window over these, so they must be position-parallel)
        mF0, mF1 = meta_fetch2(m >> 6)
        if has_delete:
            mb = mb_ref[pl.ds(base_row, R2), :].astype(jnp.int32)
            bF0, bF1 = meta_fetch2(mb >> 6)

        NEGS = jnp.int32(NEG)

        def fd_row(fd):
            """One forward-delete row of the decision table: the exact
            6-branch transition at every position given carried fd."""
            if fd:
                mf, F0, F1 = mb, bF0, bF1
            else:
                mf, F0, F1 = m, mF0, mF1
            cur_idx = mf >> 6
            cur_len = (mf & 63) - fd * lil_off
            found = mf != 0

            of, onw = F0 & 0xFF, (F0 >> 8) & 0xFF
            olen1, olen2 = (F0 >> 16) & 0xFF, (F0 >> 24) & 0xFF
            af1, anw1 = F1 & 0xFF, (F1 >> 8) & 0xFF
            af2, anw2 = (F1 >> 16) & 0xFF, (F1 >> 24) & 0xFF

            bb_i1 = win(bb, cur_len)
            do_eval = found & (pos_abs + cur_len < n_valid) & (
                ((of & 32) == 0) | (bb_i1 != 12))

            has_alt1 = do_eval & (olen1 > 0)
            has_alt2 = has_alt1 & (olen2 > 0)
            valid_first = [do_eval, has_alt1, has_alt2]
            first_len = [cur_len, olen1 - fd, olen2 - fd]
            delta3 = [jnp.where(valid_first[r], first_len[r], cur_len)
                      for r in range(3)]
            f_first = [of, af1, af2]
            fnw = [onw - fd, anw1 - fd, anw2 - fd]   # nWords - forwardDelete

            m3 = [win(m, delta3[r]) for r in range(3)]
            s_len = [m3[r] & 63 for r in range(3)]
            valid_nb = [valid_first[r] & (m3[r] != 0) for r in range(3)]
            sF0 = [win(mF0, delta3[r]) for r in range(3)]
            sf = [sF0[r] & 0xFF for r in range(3)]
            snw = [(sF0[r] >> 8) & 0xFF for r in range(3)]
            nb_nb = [win(bb, delta3[r] + s_len[r]) for r in range(3)]

            scores = []
            for r in range(3):
                bl = first_len[r] + s_len[r]
                base = (bl + (f_first[r] >> 7) + (sf[r] >> 7)
                        + jnp.maximum(fnw[r] - 1, 0)
                        + jnp.maximum(snw[r] - 1, 0)
                        + ((sf[r] >> 2) & 1) + ((nb_nb[r] >> 2) & 1)
                        + (fnw[r] + snw[r] + (nb_nb[r] >> 3)) * 100)
                ded = ((f_first[r] & 1 & (sf[r] >> 1)) * 103
                       + ((f_first[r] >> 3) & 1 & (sf[r] >> 4)) * 100
                       + (sf[r] & 1 & nb_nb[r]) * 3)
                if r > 0:
                    ded = ded + jnp.where(bl < cur_len, 100, 0) \
                        + jnp.where(bl == cur_len, 10000, 0)
                scores.append(jnp.where(valid_nb[r], base - ded, NEGS))

            if has_delete:
                # forward-delete branches (go/tokenmonster.go:1088-1108):
                # second token re-probed with the virtual space prefix
                mb3 = [win(mb, delta3[r]) for r in range(3)]
                sbF0 = [win(bF0, delta3[r]) for r in range(3)]
                for r in range(3):
                    secb_lenf = mb3[r] & 63
                    secb_len = secb_lenf - lil_off
                    sfb = sbF0[r] & 0xFF
                    snwb = (sbF0[r] >> 8) & 0xFF
                    want_b = (valid_nb[r] & ((sf[r] & 2) != 0)
                              & (nb_nb[r] == 1) & (snw[r] == 0)
                              & (secb_lenf > s_len[r] + 1))
                    nb_b = win(bb, delta3[r] + secb_len)
                    bl = first_len[r] + secb_len
                    base = (bl + (f_first[r] >> 7) + (sfb >> 7)
                            + jnp.maximum(fnw[r] - 1, 0)
                            + jnp.maximum(snwb - 1, 0)
                            + ((nb_b >> 2) & 1)
                            + (fnw[r] + snwb + (nb_b >> 3)) * 100)
                    ded = ((f_first[r] & 1) * 103
                           + ((f_first[r] >> 3) & 1 & (sfb >> 4)) * 100
                           + (sfb & 1 & nb_b) * 3 + 1)
                    if r > 0:
                        ded = ded + jnp.where(bl < cur_len, 100, 0) \
                            + jnp.where(bl == cur_len, 10000, 0)
                    scores.append(jnp.where(want_b, base - ded, NEGS))

            mx = scores[0]
            for s in scores[1:]:
                mx = jnp.maximum(mx, s)
            any_branch = mx != NEGS
            # first-hit tie order s1 > s2 > s3 > s1b > s2b > s3b
            w6 = jnp.full_like(mx, len(scores) - 1)
            for r in range(len(scores) - 2, -1, -1):
                w6 = jnp.where(scores[r] == mx, r, w6)
            w3 = w6 % 3
            is_b = any_branch & (w6 >= 3)
            adv = jnp.where(w3 == 0, first_len[0],
                            jnp.where(w3 == 1, first_len[1], first_len[2]))

            new_pos_rel = jnp.where(
                found, jnp.where(any_branch, adv, cur_len), 1)
            miss = ~found & (pos_abs < n_valid)
            has_tok = (found | (miss & has_unk))

            delta_out = jnp.clip(new_pos_rel, 1, 63)
            ctl = (delta_out
                   | jnp.where(is_b, (1 << 6) | (1 << 8), 0)
                   | jnp.where(has_tok, 1 << 7, 0)
                   | jnp.where(miss, 1 << 9, 0)).astype(jnp.uint32)
            tok = jnp.where(
                miss, jnp.uint32((3 << W3_SHIFT) | unk_token),
                (cur_idx.astype(jnp.uint32)
                 | (w3.astype(jnp.uint32) << W3_SHIFT))).astype(jnp.uint32)
            return ctl, tok

        # outputs are grid-blocked (TILE, 128) windows — only the live
        # tile sits in VMEM (the trainer's big-pool meta planes need it)
        for i, fd in enumerate((0, 1) if has_delete else (0,)):
            ctl, tok = fd_row(fd)
            out_refs[2 * i][:] = ctl[:TILE]
            out_refs[2 * i + 1][:] = tok[:TILE]

    @jax.jit
    def decide(m_tab, text, n, planes_in=None, bb_in=None):
        if planes_in is None:
            planes_in, bb_in = planes, bb_tbl
        N = m_tab.shape[0]
        rows = N // 128
        n_tiles = rows // TILE
        pad = jnp.zeros((EXTRA_ROWS, 128), jnp.uint32)
        m2 = jnp.concatenate([m_tab.reshape(rows, 128), pad])
        t2 = jnp.concatenate([text.reshape(rows, 128),
                              pad.astype(text.dtype)])
        out_spec = pl.BlockSpec((TILE, 128), lambda i: (i, 0))
        ctl, tok = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((rows, 128), jnp.uint32)),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=(out_spec, out_spec),
            interpret=interpret,
        )(jnp.asarray(n, jnp.int32).reshape(1), m2, t2, planes_in, bb_in)
        return ctl.reshape(-1), tok.reshape(-1)

    @jax.jit
    def decide_fd(m_tab, mb_tab, text, n, planes_in=None, bb_in=None):
        if planes_in is None:
            planes_in, bb_in = planes, bb_tbl
        N = m_tab.shape[0]
        rows = N // 128
        n_tiles = rows // TILE
        pad = jnp.zeros((EXTRA_ROWS, 128), jnp.uint32)
        m2 = jnp.concatenate([m_tab.reshape(rows, 128), pad])
        mb2 = jnp.concatenate([mb_tab.reshape(rows, 128), pad])
        t2 = jnp.concatenate([text.reshape(rows, 128),
                              pad.astype(text.dtype)])
        os = jax.ShapeDtypeStruct((rows, 128), jnp.uint32)
        out_spec = pl.BlockSpec((TILE, 128), lambda i: (i, 0))
        ctl0, tok0, ctl1, tok1 = pl.pallas_call(
            kernel,
            out_shape=(os, os, os, os),
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=tuple(out_spec for _ in range(4)),
            interpret=interpret,
        )(jnp.asarray(n, jnp.int32).reshape(1), m2, mb2, t2, planes_in,
          bb_in)
        return (jnp.stack([ctl0.reshape(-1), ctl1.reshape(-1)]),
                jnp.stack([tok0.reshape(-1), tok1.reshape(-1)]))

    return decide_fd if has_delete else decide


def resolve_tokens(vocab, tok_packed: np.ndarray) -> np.ndarray:
    """idx|w3<<W3_SHIFT -> emitted id via ids3 (one gather per record).
    w3 == 3 marks a literal id (unk / delete filler) in the low bits.
    Bit 22 (pallas_stitch.DEL_BIT) marks a forward-delete record: the
    delete token id is spliced in after the resolved id (the compact
    kernel emits one slot per record; go/tokenmonster.go:1234-1245
    appends ``original.id, deleteToken``)."""
    ids3 = np.stack([vocab.id, vocab.id1, vocab.id2], axis=1).astype(np.uint32)
    mask = (1 << W3_SHIFT) - 1
    idx = (tok_packed & mask).astype(np.int64)
    w3 = (tok_packed >> W3_SHIFT).astype(np.int64) & 3
    lit = w3 == 3
    idxc = np.minimum(idx, len(ids3) - 1)
    out = ids3[idxc, np.minimum(w3, 2)]
    if lit.any():
        out = np.where(lit, (tok_packed & mask).astype(np.uint32), out)
    del_mask = (tok_packed & (1 << 22)) != 0
    if del_mask.any():
        out = np.insert(out, np.nonzero(del_mask)[0] + 1,
                        np.uint32(vocab.delete_token & 0xFFFFFF))
    return out
