"""Phase 2 of TPU tokenization: the chunk-parallel ungreedy automaton.

The reference's tokenize loop (go/tokenmonster.go:1048-1277) is sequential:
each iteration consumes the carried longest match, evaluates up to 6 branches
and emits 1-2 tokens.  The key restructuring insight: at every emission point
the automaton state is exactly ``(position, forwardDelete)`` — the carried
match is a pure function of that pair via the precomputed tables
M (ops/match.py) and Mb (space-prefixed variant).  That makes speculative
chunk starts reconcilable: every lane scans from its chunk start with
state (start, 0), continues ``OVERLAP_SCAN`` bytes into the next chunk, and
the host stitcher finds the first emission state shared by neighbouring
lanes.  From that sync point on, the speculative stream provably equals the
sequential one, so the final output is byte-exact vs. the oracle
(core/tokenizer.py).  If a junction never syncs (pathological data), the
stitcher falls back to the host oracle for that junction only.

Score formula and tie-break order are the exact ints of
go/tokenmonster.go:1075-1084 / :1217-1262.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.tokenmeta import DOES_NOT_EXIST
from .automaton import build_match_automata
from .match import compute_match_table

NEG = -1000000
OVERLAP_SCAN = 128  # bytes a lane scans past its chunk end to find sync

# record packing: pos(bits 4..31) | fd(0) | has_tok(1) | has_del(2) | miss(3)
_REC_FD = 1
_REC_TOK = 2
_REC_DEL = 4
_REC_MISS = 8


@dataclass
class DeviceVocab:
    """Device-resident arrays for the TPU tokenizer, built from a Vocab."""
    p1: jnp.ndarray          # flag | nwords<<8 | len1<<16 | len2<<24 (u32)
    index1: jnp.ndarray      # alt1 dict index (u32, DNE sentinel)
    index2: jnp.ndarray
    ids: jnp.ndarray         # id, id1, id2 packed as (n,3) u32
    begin_byte: jnp.ndarray  # (256,) i32
    main_dfa: jnp.ndarray
    main_out: jnp.ndarray
    space_dfa: jnp.ndarray | None
    space_out: jnp.ndarray | None
    has_delete: bool
    delete_token: int
    has_unk: bool
    unk_token: int
    max_token_length: int

    @classmethod
    def build(cls, vocab) -> "DeviceVocab":
        if vocab.charset == 2:
            raise NotImplementedError("TPU path supports charset 0/1 (UTF-8)")
        n = len(vocab.tokens)
        p1 = (vocab.flag.astype(np.uint32)
              | (vocab.nwords.astype(np.uint32) << 8)
              | (vocab.len1.astype(np.uint32) << 16)
              | (vocab.len2.astype(np.uint32) << 24))
        ids = np.stack([vocab.id, vocab.id1, vocab.id2], axis=1).astype(np.uint32)
        main, space = build_match_automata(vocab)
        return cls(
            p1=jnp.asarray(p1),
            index1=jnp.asarray(vocab.index1),
            index2=jnp.asarray(vocab.index2),
            ids=jnp.asarray(ids),
            begin_byte=jnp.asarray(vocab.begin_byte.astype(np.int32)),
            main_dfa=jnp.asarray(main.dfa),
            main_out=jnp.asarray(main.out),
            space_dfa=jnp.asarray(space.dfa) if space is not None else None,
            space_out=jnp.asarray(space.out) if space is not None else None,
            has_delete=vocab.delete_token != DOES_NOT_EXIST,
            delete_token=int(vocab.delete_token),
            has_unk=vocab.unk_token != DOES_NOT_EXIST,
            unk_token=int(vocab.unk_token),
            max_token_length=int(vocab.max_token_length),
        )


def _max0(x):
    return jnp.maximum(x, 0)


def scan_lanes(m_tab, mb_tab, bb, p1, index1_t, index2_t, ids3,
               n, chunk: int, n_lanes: int,
               has_delete: bool, has_unk: bool,
               delete_token: int, unk_token: int,
               overlap: int = OVERLAP_SCAN, strip_mode: bool = False):
    """Pure function (composable under jit/shard_map): run the automaton on
    every lane.  Returns (rec, tok) of shape (T, L): packed step records and
    primary emitted token ids.  With strip_mode (trainer), every lane is an
    independent strip: it stops exactly at its chunk boundary and the
    lookahead evaluation window ends there too (overlap should be 0 and the
    match tables strip-local; see parallel/score.py)."""
    L = n_lanes
    T = chunk + overlap
    starts = jnp.arange(L, dtype=jnp.int32) * chunk
    stops = jnp.minimum(starts + chunk + overlap, n)
    eval_end = stops if strip_mode else n

    DNE = jnp.uint32(DOES_NOT_EXIST)

    def get_m(p):
        return jnp.take(m_tab, p)

    def get_mb(p):
        return jnp.take(mb_tab, p)

    def get_bb(p):
        return jnp.take(bb, p)

    def meta(idx):
        v = jnp.take(p1, idx).astype(jnp.int32)
        return v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF

    def pair_score(branch_len, ff, nw_adj, second_idx, second_len, end_pos,
                   is_b, greedy_len, is_alt, valid):
        """The exact score formula (go/tokenmonster.go:1075-1084)."""
        sf, snw, _, _ = meta(second_idx)
        nb = get_bb(end_pos)
        base = (branch_len
                + (ff >> 7) + (sf >> 7)
                + _max0(nw_adj - 1) + _max0(snw - 1)
                + jnp.where(is_b, 0, (sf >> 2) & 1)
                + ((nb >> 2) & 1)
                + (nw_adj + snw + (nb >> 3)) * 100)
        ded = (jnp.where(is_b, ff & 1, ff & 1 & (sf >> 1)) * 103
               + ((ff >> 3) & 1 & (sf >> 4)) * 100
               + (sf & 1 & nb) * 3
               + jnp.where(is_b, 1, 0))
        alt_ded = jnp.where(
            is_alt,
            jnp.where(branch_len < greedy_len, 100, 0)
            + jnp.where(branch_len == greedy_len, 10000, 0),
            0)
        score = base - ded - alt_ded
        return jnp.where(valid, score, NEG)

    def step(carry, _):
        pos, fd, done = carry
        safe_pos = jnp.minimum(pos, n)  # padded tables

        m_plain = get_m(safe_pos)
        mb_here = get_mb(safe_pos) if has_delete else jnp.zeros_like(m_plain)
        m = jnp.where(fd == 1, mb_here, m_plain)
        cur_idx = (m >> 6).astype(jnp.int32)
        cur_len = (m & 63).astype(jnp.int32) - fd
        found = m != 0

        of, onw, olen1, olen2 = meta(cur_idx)
        oidx1 = jnp.take(index1_t, cur_idx)
        oidx2 = jnp.take(index2_t, cur_idx)
        oids = jnp.take(ids3, cur_idx, axis=0)  # (L,3) id,id1,id2

        i1 = safe_pos + cur_len
        do_eval = found & (i1 < eval_end) & (((of & 32) == 0) | (get_bb(i1) != 12))
        nw_adj = onw - fd

        # ---- branch 1 (keep greedy) ----
        m1 = get_m(i1)
        idxA = (m1 >> 6).astype(jnp.int32)
        lenA = (m1 & 63).astype(jnp.int32)
        v1 = do_eval & (m1 != 0)
        s1 = pair_score(cur_len + lenA, of, nw_adj, idxA, lenA, i1 + lenA,
                        False, cur_len, False, v1)

        # ---- branch 1b ----
        if has_delete:
            sfA, snwA, _, _ = meta(idxA)
            nbA = get_bb(i1 + lenA)
            want_b1 = v1 & ((sfA & 2) != 0) & (nbA == 1) & (snwA == 0)
            mb1 = get_mb(i1)
            idxAb = (mb1 >> 6).astype(jnp.int32)
            lenAb_full = (mb1 & 63).astype(jnp.int32)
            v1b = want_b1 & (lenAb_full > lenA + 1)
            lenAb = lenAb_full - 1
            s1b = pair_score(cur_len + lenAb, of, nw_adj, idxAb, lenAb,
                             i1 + lenAb, True, cur_len, False, v1b)
        else:
            idxAb = idxA
            lenAb = lenA
            s1b = jnp.full_like(s1, NEG)

        # ---- branch 2 (alt1) ----
        has_alt1 = do_eval & (oidx1 != DNE)
        alt1_idx = jnp.where(has_alt1, oidx1, 0).astype(jnp.int32)
        i2 = safe_pos + olen1 - fd
        i2 = jnp.where(has_alt1, i2, i1)
        m2 = get_m(i2)
        idxB = (m2 >> 6).astype(jnp.int32)
        lenB = (m2 & 63).astype(jnp.int32)
        v2 = has_alt1 & (m2 != 0)
        ff1, fnw1, _, _ = meta(alt1_idx)
        nw1_adj = fnw1 - fd
        bl2 = olen1 + lenB - fd
        s2 = pair_score(bl2, ff1, nw1_adj, idxB, lenB, i2 + lenB,
                        False, cur_len, True, v2)

        if has_delete:
            sfB, snwB, _, _ = meta(idxB)
            nbB = get_bb(i2 + lenB)
            want_b2 = v2 & ((sfB & 2) != 0) & (nbB == 1) & (snwB == 0)
            mb2 = get_mb(i2)
            idxBb = (mb2 >> 6).astype(jnp.int32)
            lenBb_full = (mb2 & 63).astype(jnp.int32)
            v2b = want_b2 & (lenBb_full > lenB + 1)
            lenBb = lenBb_full - 1
            bl2b = olen1 + lenBb - fd
            s2b = pair_score(bl2b, ff1, nw1_adj, idxBb, lenBb, i2 + lenBb,
                             True, cur_len, True, v2b)
        else:
            idxBb = idxB
            lenBb = lenB
            s2b = jnp.full_like(s1, NEG)

        # ---- branch 3 (alt2) ----
        has_alt2 = has_alt1 & (oidx2 != DNE)
        alt2_idx = jnp.where(has_alt2, oidx2, 0).astype(jnp.int32)
        i3 = safe_pos + olen2 - fd
        i3 = jnp.where(has_alt2, i3, i1)
        m3 = get_m(i3)
        idxC = (m3 >> 6).astype(jnp.int32)
        lenC = (m3 & 63).astype(jnp.int32)
        v3 = has_alt2 & (m3 != 0)
        ff2, fnw2, _, _ = meta(alt2_idx)
        nw2_adj = fnw2 - fd
        bl3 = olen2 + lenC - fd
        s3 = pair_score(bl3, ff2, nw2_adj, idxC, lenC, i3 + lenC,
                        False, cur_len, True, v3)

        if has_delete:
            sfC, snwC, _, _ = meta(idxC)
            nbC = get_bb(i3 + lenC)
            want_b3 = v3 & ((sfC & 2) != 0) & (nbC == 1) & (snwC == 0)
            mb3 = get_mb(i3)
            idxCb = (mb3 >> 6).astype(jnp.int32)
            lenCb_full = (mb3 & 63).astype(jnp.int32)
            v3b = want_b3 & (lenCb_full > lenC + 1)
            lenCb = lenCb_full - 1
            bl3b = olen2 + lenCb - fd
            s3b = pair_score(bl3b, ff2, nw2_adj, idxCb, lenCb, i3 + lenCb,
                             True, cur_len, True, v3b)
        else:
            idxCb = idxC
            lenCb = lenC
            s3b = jnp.full_like(s1, NEG)

        # ---- winner (tie order: s1 > s2 > s3 > s1b > s2b > s3b) ----
        mx = jnp.maximum(s1, jnp.maximum(
            s2, jnp.maximum(s3, jnp.maximum(s1b, jnp.maximum(s2b, s3b)))))
        any_branch = mx != NEG
        w1 = any_branch & (s1 == mx)
        w2 = any_branch & ~w1 & (s2 == mx)
        w3 = any_branch & ~w1 & ~w2 & (s3 == mx)
        w1b = any_branch & ~w1 & ~w2 & ~w3 & (s1b == mx)
        w2b = any_branch & ~w1 & ~w2 & ~w3 & ~w1b & (s2b == mx)
        w3b = any_branch & ~w1 & ~w2 & ~w3 & ~w1b & ~w2b & (s3b == mx)
        skip = found & ~any_branch  # fast path / nothing found / eval off

        is_b = w1b | w2b | w3b
        use_alt1 = w2 | w2b
        use_alt2 = w3 | w3b

        # emitted token: id (w1/w1b/skip), id1 (w2/w2b), id2 (w3/w3b)
        emit_id = jnp.where(use_alt1, oids[:, 1],
                            jnp.where(use_alt2, oids[:, 2], oids[:, 0]))
        # advance
        adv = jnp.where(use_alt1, olen1 - fd,
                        jnp.where(use_alt2, olen2 - fd, cur_len))
        new_pos = safe_pos + jnp.where(found, adv, 1)
        new_fd = jnp.where(is_b, 1, 0)

        miss = ~found
        has_tok = (found | (miss & has_unk)) & ~done
        tok = jnp.where(miss, jnp.uint32(unk_token), emit_id)
        rec = ((new_pos.astype(jnp.uint32) << 4)
               | (new_fd.astype(jnp.uint32) * _REC_FD)
               | (has_tok.astype(jnp.uint32) * _REC_TOK)
               | ((is_b & ~done).astype(jnp.uint32) * _REC_DEL)
               | ((miss & ~done).astype(jnp.uint32) * _REC_MISS))
        rec = jnp.where(done, 0, rec)

        new_done = done | (new_pos >= stops)
        new_pos = jnp.where(done, pos, new_pos)
        new_fd = jnp.where(done, fd, new_fd)
        return (new_pos, new_fd, new_done), (rec, tok)

    # while_loop with early exit: a lane finishes after ~1 step per emitted
    # token (avg ~3-4 bytes/step), far fewer than the worst-case T steps.
    recs0 = jnp.zeros((T, L), jnp.uint32)
    toks0 = jnp.zeros((T, L), jnp.uint32)

    def cond(state):
        t, pos, fd, done, recs, toks = state
        return (t < T) & ~jnp.all(done)

    def body(state):
        t, pos, fd, done, recs, toks = state
        (pos, fd, done), (rec, tok) = step((pos, fd, done), None)
        recs = jax.lax.dynamic_update_slice(recs, rec[None, :], (t, 0))
        toks = jax.lax.dynamic_update_slice(toks, tok[None, :], (t, 0))
        return (t + 1, pos, fd, done, recs, toks)

    init = (jnp.int32(0), starts, jnp.zeros(L, jnp.int32), starts >= stops,
            recs0, toks0)
    _, _, _, _, recs, toks = jax.lax.while_loop(cond, body, init)
    return recs, toks


_scan_kernel = jax.jit(
    scan_lanes,
    static_argnames=("chunk", "n_lanes", "has_delete", "has_unk",
                     "delete_token", "unk_token", "overlap", "strip_mode"))


class TpuTokenizer:
    """End-to-end TPU tokenizer for a vocabulary: one fused device dispatch
    (match tables + ungreedy scan) followed by the host stitcher."""

    def __init__(self, vocab, chunk: int = 2048):
        self.vocab = vocab
        self.chunk = chunk
        self.dv = DeviceVocab.build(vocab)
        self._bb_byte = jnp.asarray(vocab.begin_byte.astype(np.int32))
        self._fused = {}

    def _fused_fn(self, n_lanes: int):
        fn = self._fused.get(n_lanes)
        if fn is not None:
            return fn
        from .match import OVERLAP, RESET, match_lanes
        chunk = self.chunk
        dv = self.dv
        has_delete = dv.has_delete and dv.space_dfa is not None
        match_chunk = 512
        total = n_lanes * chunk

        def device_tokenize(text, n, dfa, dout, sdfa, sout, bb_byte,
                            p1, i1t, i2t, ids3):
            # phase 1 (shared lane layout for both automatons)
            m_lanes = total // match_chunk
            rev = jnp.full(total + OVERLAP, RESET, jnp.int32)
            body = jnp.flip(text.astype(jnp.int32))
            # positions >= n are padding: map to RESET
            posr = total - 1 - jnp.arange(total, dtype=jnp.int32)
            body = jnp.where(posr < n, body, RESET)
            rev = jax.lax.dynamic_update_slice(rev, body, (OVERLAP,))
            pad = jnp.zeros(64, jnp.uint32)
            m = jnp.flip(match_lanes(dfa, dout, rev, match_chunk, m_lanes))
            m_tab = jnp.concatenate([m, pad])
            if has_delete:
                mb = jnp.flip(match_lanes(sdfa, sout, rev, match_chunk, m_lanes))
                mb_tab = jnp.concatenate([mb, pad])
            else:
                mb_tab = m_tab
            bb = jnp.concatenate([
                jnp.take(bb_byte, text.astype(jnp.int32)),
                jnp.full(64, bb_byte[0], jnp.int32)])
            return scan_lanes(
                m_tab, mb_tab, bb, p1, i1t, i2t, ids3,
                n, chunk, n_lanes, has_delete,
                dv.has_unk, dv.delete_token & 0xFFFFFF,
                dv.unk_token & 0xFFFFFF)

        fn = jax.jit(device_tokenize)
        self._fused[n_lanes] = fn
        return fn

    def tokenize(self, data: bytes):
        """Tokenize normalized+capcoded bytes; returns (ids u32, missing)."""
        vocab = self.vocab
        n = len(data)
        if n == 0 or vocab.max_token_length == 0:
            return np.zeros(0, np.uint32), 0
        arr = np.frombuffer(bytes(data), np.uint8)
        chunk = self.chunk
        from .match import _bucket
        n_lanes = _bucket(-(-n // chunk))
        total = n_lanes * chunk
        text = np.zeros(total, np.uint8)
        text[:n] = arr
        dv = self.dv
        sdfa = dv.space_dfa if dv.space_dfa is not None else dv.main_dfa
        sout = dv.space_out if dv.space_out is not None else dv.main_out
        recs, toks = self._fused_fn(n_lanes)(
            jnp.asarray(text), n, dv.main_dfa, dv.main_out, sdfa, sout,
            self._bb_byte, dv.p1, dv.index1, dv.index2, dv.ids)
        recs = np.asarray(recs)  # (T, L)
        toks = np.asarray(toks)
        real_lanes = -(-n // chunk)
        return self._stitch(arr, recs.T[:real_lanes], toks.T[:real_lanes],
                            n, chunk, real_lanes)

    # ---- host stitcher ----

    def _stitch(self, data, recs, toks, n, chunk, n_lanes):
        """recs/toks: (L, T).  Returns (ids, missing)."""
        out_parts = []
        missing = 0
        delete_token = np.uint32(self.dv.delete_token)

        lane_recs = []
        for l in range(n_lanes):
            r = recs[l]
            valid = r != 0
            r = r[valid]
            t = toks[l][valid]
            pos = r >> 4
            lane_recs.append((r, t, pos))

        # sync_pos[l]: first common (pos, fd) state between lane l-1 and l
        prev_cut = 0  # index into lane 0's records from which output starts
        cur = 0
        for l in range(n_lanes):
            r, t, pos = lane_recs[l]
            if l + 1 < n_lanes:
                nr, nt, npos = lane_recs[l + 1]
                j_next = (l + 1) * chunk
                # states packed as pos*2+fd
                a = (pos.astype(np.int64) << 1) | (r & _REC_FD)
                b = (npos.astype(np.int64) << 1) | (nr & _REC_FD)
                common = np.intersect1d(a[pos >= j_next], b)
                if len(common) == 0:
                    # pathological junction: fall back to host oracle from
                    # the end of this lane's exact region
                    return self._host_fallback(data)
                sync = common[0]
                end_idx = int(np.searchsorted(a, sync, side="right"))
                start_next = int(np.searchsorted(b, sync, side="right"))
            else:
                end_idx = len(r)
                start_next = 0
            seg_r = r[prev_cut:end_idx]
            seg_t = t[prev_cut:end_idx]
            has_tok = (seg_r & _REC_TOK) != 0
            has_del = (seg_r & _REC_DEL) != 0
            missing += int(((seg_r & _REC_MISS) != 0).sum())
            n_out = int(has_tok.sum() + has_del.sum())
            if n_out:
                buf = np.empty(n_out, np.uint32)
                # interleave: token, then delete marker where flagged
                idx = np.cumsum(has_tok.astype(np.int64) + has_del.astype(np.int64))
                tok_slots = idx - 1 - has_del.astype(np.int64)
                buf[tok_slots[has_tok]] = seg_t[has_tok]
                buf[idx[has_del] - 1] = delete_token
                out_parts.append(buf)
            prev_cut = start_next
            cur += 1

        if out_parts:
            ids = np.concatenate(out_parts)
        else:
            ids = np.zeros(0, np.uint32)
        return ids, missing

    def _host_fallback(self, data):
        from ..core.tokenizer import tokenize as host_tokenize
        return host_tokenize(self.vocab, bytes(data))
