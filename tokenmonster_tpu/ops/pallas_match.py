"""Pallas longest-match kernel: VMEM hash-table probes in position layout.

Replaces the XLA AC-DFA match phase (ops/match.py), whose 2 scalar gathers
per byte cap it at ~27 MB/s on this TPU (XLA lowers gathers to ~94 M/s).
Every byte position probes each key-length class's displaced hash table
(ops/hashmatch.py).  Tables are FIELD-MAJOR bit-packed int32 planes: slot
s lives at (s>>7, s&127) of every plane; payload = index field(s) then the
raw key bytes.  A probe per 128-position group is:
  - one lane-shuffle per plane (take_along_axis by the slot lane — the
    fast Mosaic within-row gather), then
  - a shared HALVING ROW-SELECT by the slot row (log2 levels of
    where-select, ~1x the plane rows instead of the round-3 one-hot
    select-sum's ~3x),
and the fetched fields are compared against bit-packed text windows built
incrementally from static text shifts — an EXACT match test, no
fingerprint uncertainty.

Delete-token vocabularies probe MERGED tables: each class carries a main
and a space-stripped index field, so one probe per length feeds both
M(p) and Mb(p) (halving the round-4 capcode-2 match cost, which paid for
two full table sets).

Everything stays in the (rows, 128) position layout: no transposes, no
per-position row vectors, no MXU layout gymnastics.  Hash mixing uses NAF
shift-add chains (the VPU u32 multiply is emulated, ~10x).

Output: m_tab packed (idx << 6) | len, 0 = no match — the ops/match.py
contract (longest-substring semantics of go/tokenmonster.go:1049,
tokenmonster-cpp/src/tokenmonster.cpp:786-877).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .hashmatch import (C1, C2, SEED, HashMatchTables, compose_fields,
                        disp_plane, key_masks, naf_terms)

TILE_ROWS = 16       # 128-position groups per grid step (2048 positions)
MARGIN_ROWS = 1      # extra text rows visible per step (windows read <= 43)
BCAST_ROWS = 4       # classes with <= this many slot rows use the
                     # broadcast-row fast path instead of the group scan

U32 = jnp.uint32

_C1_TERMS = naf_terms(int(C1))
_C2_TERMS = naf_terms(int(C2))


def _mul_terms(x, terms):
    """x * const (mod 2^32) via the NAF shift-add chain."""
    acc = None
    for k, sign in terms:
        t = (x << U32(k)).astype(U32) if k else x
        if acc is None:
            acc = t if sign > 0 else (U32(0) - t).astype(U32)
        elif sign > 0:
            acc = (acc + t).astype(U32)
        else:
            acc = (acc - t).astype(U32)
    return acc


def _single_tbl(single, alive=None):
    """(2,128) i32 direct table of idx+1 by byte value, optionally masked."""
    sv = single.astype(np.int64)
    if alive is not None:
        live = alive[np.maximum(sv, 0)]
        sv = np.where((sv >= 0) & live, sv, -1)
    return jnp.asarray((sv + 1).astype(np.int32).reshape(2, 128))


def flat_tables(tables: HashMatchTables, alive: np.ndarray | None = None):
    """The flat runtime-argument tuple for ``match(text, n, tabs=...)`` —
    same order the kernel reads its refs.  With ``alive`` (bool per
    dictionary index), slots of dead tokens have their index bits zeroed
    and dead singles cleared: the SAME placement (geometry, salts,
    displacements) then behaves as the sub-dictionary, which is how the
    trainer scores candidate vocabularies without rebuilding or
    recompiling (superset placement, per-candidate masking)."""
    args = [jnp.asarray(compose_fields(c, alive)) for c in tables.classes]
    args += [jnp.asarray(disp_plane(c)) for c in tables.classes]
    args.append(_single_tbl(tables.single, alive))
    if tables.has_space:
        args.append(_single_tbl(tables.space_single, alive))
    return tuple(args)


def build_device_tables(tables: HashMatchTables):
    """Device-resident arrays (unmasked) in flat_tables order."""
    return flat_tables(tables)


def smem_scalars(tables: HashMatchTables,
                 alive: np.ndarray | None = None) -> np.ndarray:
    """The per-call SMEM scalar vector (excluding n, which is prepended by
    the wrapper): [space_empty+1, then per class per overflow key its
    main idx+1 (and space idx+1 for merged tables)] — each 0 when absent
    or masked dead for the candidate."""
    se = tables.space_empty
    if se < 0 or (alive is not None and not alive[se]):
        se_v = 0
    else:
        se_v = se + 1

    def live1(i):
        if i < 0 or (alive is not None and not alive[i]):
            return 0
        return i + 1

    out = [se_v]
    for c in tables.classes:
        for mi, si in zip(c.ovf_idx, c.ovf_idx_space):
            out.append(live1(mi))
            if tables.has_space:
                out.append(live1(si))
    return np.asarray(out, np.int32)


def _class_vmem_bytes(c) -> int:
    """Composed device bytes of one class (8-row padding included)."""
    r8 = max(8, -(-c.n_rows // 8) * 8)
    total = c.n_fields * r8 * 128 * 4
    packed = -(-max(2, 1 << c.b_bits) // 2)
    dr8 = max(8, -(-(-(-packed // 128)) // 8) * 8)
    return total + dr8 * 128 * 4


VMEM_TABLE_CAP = 9 << 20   # per-pallas_call hash-table budget (v5e: 16 MB
                           # scoped VMEM minus text buffer + working set)


def make_match_kernel(tables: HashMatchTables, interpret: bool = False,
                      ablate: frozenset = frozenset(),
                      vmem_cap_bytes: int = VMEM_TABLE_CAP):
    """fn(text u8[N]) -> m_tab u32[N], or (m_tab, mb_tab) when the tables
    carry the space-stripped structure (delete-token vocabularies).  N must
    be a multiple of 128*TILE_ROWS; the caller guarantees >= 128 zero bytes
    of padding after real data (windows read ahead; an extra margin row is
    appended here).  mb_tab packs (idx << 6) | full_len where full_len
    includes the virtual space prefix (the ``lilbuf`` probe contract,
    go/tokenmonster.go:1029-1036).  ``ablate`` is a perf-debugging knob
    set: {"one_field", "no_probe", "no_disp"}.

    Tables whose composed planes exceed ``vmem_cap_bytes`` are PARTITIONED
    by length class into multiple pallas_calls (disjoint lengths), merged
    by match length — this is how multi-million-token trainer superset
    pools run the fast path on a 16 MB-VMEM part."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    classes = tables.classes
    n_cls = len(classes)
    has_space = tables.has_space
    n_idx = 2 if has_space else 1
    idx1_bits = classes[0].idx1_bits if classes else 21
    idx_bits = idx1_bits * n_idx
    lil_off = tables.lil_off
    R_TOT = TILE_ROWS + MARGIN_ROWS
    # SMEM layout: [n, space_empty+1, ovf entries...] — GLOBAL across parts
    ovf_off = []
    acc = 1
    for c in classes:
        ovf_off.append(acc)
        acc += len(c.ovf_keys) * n_idx

    # partition classes under the VMEM cap (order-preserving greedy)
    parts: list[list[int]] = []
    cur: list[int] = []
    cur_b = 0
    for gi, c in enumerate(classes):
        b = _class_vmem_bytes(c)
        if cur and cur_b + b > vmem_cap_bytes:
            parts.append(cur)
            cur, cur_b = [], 0
        cur.append(gi)
        cur_b += b
    parts.append(cur)

    baked_tabs = flat_tables(tables)
    n_sing = 2 if has_space else 1

    def part_tabs(tabs, part):
        return ([tabs[gi] for gi in part]
                + [tabs[n_cls + gi] for gi in part]
                + list(tabs[2 * n_cls:]))

    def make_part_kernel(part: list[int], include_base: bool):
        part_classes = [(li, gi, classes[gi]) for li, gi in enumerate(part)]
        n_part = len(part)
        max_len = max(classes[gi].length for gi in part)
        by_len = {classes[gi].length: (li, gi)
                  for li, gi in enumerate(part)}

        def kernel(n_ref, text_ref, *refs):
            if has_space:
                out_ref, outb_ref = refs[-2], refs[-1]
                single_ref = refs[-4]
                sp_single_ref = refs[-3]
            else:
                out_ref = refs[-1]
                single_ref = refs[-2]
            step = pl.program_id(0)
            base_row = step * TILE_ROWS
            t = text_ref[pl.ds(base_row, R_TOT), :].astype(jnp.int32)

            lane = jax.lax.broadcasted_iota(jnp.int32, (R_TOT, 128), 1)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (R_TOT, 128), 0)
            # absolute byte position of every element; matches must end
            # <= n (the reference never matches past the valid length)
            pos_abs = (base_row + rowi) * 128 + lane
            n_valid = n_ref[0]
            shift_cache = {0: t}

            def shift(k):
                """sh[p] = flat_text[p+k] in (R_TOT, 128) layout, k<128."""
                got = shift_cache.get(k)
                if got is not None:
                    return got
                a = pltpu.roll(t, 128 - k, 1)
                c_ = pltpu.roll(a, R_TOT - 1, 0)     # next-row carry
                out = jnp.where(lane < 128 - k, a, c_)
                shift_cache[k] = out
                return out

            def single_lookup(ref):
                """256-entry direct table (2 x 128) lookup by byte value."""
                s_all = ref[:]
                r0 = jnp.take_along_axis(
                    jnp.broadcast_to(s_all[0:1, :], (R_TOT, 128)), t & 127,
                    axis=1)
                r1 = jnp.take_along_axis(
                    jnp.broadcast_to(s_all[1:2, :], (R_TOT, 128)), t & 127,
                    axis=1)
                return jnp.where(t < 128, r0, r1)

            best = jnp.zeros((R_TOT, 128), jnp.int32)
            bestb = best
            if include_base:
                # length-1 keys: direct table
                sidx1 = single_lookup(single_ref)
                best = jnp.where((sidx1 > 0) & (pos_abs + 1 <= n_valid),
                                 ((sidx1 - 1) << 6) | 1, best)
                if has_space:
                    # forward-delete base cases: the bare prefix token
                    # matches every position (the probe window always
                    # begins with the virtual space), stripped single-byte
                    # keys via their direct table.  space_empty arrives as
                    # an SMEM scalar (idx+1, 0=none) so the trainer can
                    # mask it per candidate without recompiling.
                    se = n_ref[1]
                    bestb = (bestb
                             + jnp.where(se > 0, ((se - 1) << 6) | lil_off,
                                         0))
                    spidx1 = single_lookup(sp_single_ref)
                    bestb = jnp.where(
                        (spidx1 > 0) & (pos_abs + 1 <= n_valid),
                        ((spidx1 - 1) << 6) | (1 + lil_off), bestb)

            def fetch(planes, srow, slane, r_log):
                from .pallas_gather import fetch_planes
                return fetch_planes(planes, srow, slane, r_log, R_TOT)

            # incremental bit-packed text windows: wf[f] covers key bytes
            # laid out at payload bits [idx_bits + 8k); byte l-1 is appended
            # once per length step, so windows are shared across classes
            wf: list = []

            def extend_windows(l):
                k = l - 1
                bitpos = idx_bits + 8 * k
                f, off = bitpos >> 5, bitpos & 31
                b = shift(k).astype(U32)
                while len(wf) <= f:
                    wf.append(jnp.zeros((R_TOT, 128), U32))
                wf[f] = (wf[f] + (b << U32(off)).astype(U32)).astype(U32)
                if off > 24:
                    if len(wf) <= f + 1:
                        wf.append(jnp.zeros((R_TOT, 128), U32))
                    wf[f + 1] = (wf[f + 1]
                                 + (b >> U32(32 - off))).astype(U32)

            def probe_class(li, gi, c, cur_best, cur_bestb, c1h, h):
                l = c.length
                S = c.S
                r_log = c.n_rows
                f_ref = refs[li]
                d_ref = refs[n_part + li]
                if c.b_bits:
                    bucket = (c1h >> U32(32 - c.b_bits)).astype(jnp.int32)
                else:
                    bucket = jnp.zeros((R_TOT, 128), jnp.int32)
                # g: C2 NAF chain then scale (hashmatch.g_of exactly; a
                # mult-free xorshift mix was tried and broke CHD placement
                # — GF(2)-linear mixes make in-bucket collisions
                # salt-invariant)
                y = _mul_terms((h ^ U32(c.salt)).astype(U32), _C2_TERMS)
                g = None
                for k, sign in c.scale:
                    term = (y >> U32(32 - k)).astype(jnp.int32)
                    if g is None:
                        g = term if sign > 0 else -term
                    elif sign > 0:
                        g = g + term
                    else:
                        g = g - term
                g = jnp.clip(g, 0, S - 1)
                if "no_disp" in ablate:
                    d = jnp.zeros((R_TOT, 128), jnp.int32)
                else:
                    dpos = bucket >> 1
                    d_rows = max(1,
                                 -(-(1 << max(c.b_bits - 1, 0)) // 128))
                    (d32,) = fetch([d_ref[:]], dpos >> 7, dpos & 127,
                                   d_rows)
                    d = jnp.where((bucket & 1) != 0,
                                  jax.lax.shift_right_logical(d32, 16),
                                  d32) & 0xFFFF
                slot = g + d
                slot = jnp.where(slot >= S, slot - S, slot)
                if "no_probe" in ablate:
                    return cur_best ^ slot, cur_bestb
                srow = slot >> 7
                slane = slot & 127
                nf = c.n_fields if "one_field" not in ablate else 1
                f_all = f_ref[:]
                got = fetch([f_all[j] for j in range(nf)], srow, slane,
                            r_log)
                gotu = [jax.lax.bitcast_convert_type(gv, U32)
                        for gv in got]
                kmask = key_masks(l, n_idx, idx1_bits)
                mism = None
                for j in range(nf):
                    if kmask[j] == 0:
                        continue
                    dvi = ((gotu[j] ^ wf[j]) & U32(kmask[j])) != 0
                    mism = dvi if mism is None else (mism | dvi)
                guard = pos_abs + l <= n_valid
                hit = (~mism) & guard
                imask = U32((1 << idx1_bits) - 1)
                idx_m = (gotu[0] & imask).astype(jnp.int32)
                cur_best = jnp.where(hit & (idx_m > 0),
                                     ((idx_m - 1) << 6) | l, cur_best)
                if has_space:
                    sp_w = jax.lax.shift_right_logical(gotu[0],
                                                       U32(idx1_bits))
                    if 2 * idx1_bits > 32:
                        sp_w = sp_w | (gotu[1] << U32(32 - idx1_bits))
                    idx_s = sp_w.astype(jnp.int32) & ((1 << idx1_bits) - 1)
                    cur_bestb = jnp.where(
                        hit & (idx_s > 0),
                        ((idx_s - 1) << 6) | (l + lil_off), cur_bestb)
                # overflow keys (full-hash collisions): direct window
                # compare vs the packed constant, masked indices from SMEM
                for j, kk in enumerate(c.ovf_keys):
                    const = [0] * len(kmask)
                    for kb in range(l):
                        bitpos = idx_bits + 8 * kb
                        f, off = bitpos >> 5, bitpos & 31
                        const[f] |= (kk[kb] << off) & 0xFFFFFFFF
                        if off > 24:
                            const[f + 1] |= kk[kb] >> (32 - off)
                    oh = guard
                    for f in range(len(kmask)):
                        if kmask[f] == 0:
                            continue
                        oh = oh & (((wf[f] ^ U32(const[f]))
                                    & U32(kmask[f])) == 0)
                    base = 1 + ovf_off[gi] + j * n_idx
                    ov_m = n_ref[base]
                    cur_best = jnp.where(oh & (ov_m > 0),
                                         ((ov_m - 1) << 6) | l, cur_best)
                    if has_space:
                        ov_s = n_ref[base + 1]
                        cur_bestb = jnp.where(
                            oh & (ov_s > 0),
                            ((ov_s - 1) << 6) | (l + lil_off), cur_bestb)
                return cur_best, cur_bestb

            h = jnp.full((R_TOT, 128), SEED, U32)
            for l in range(1, max_len + 1):
                # (h*257 + b) ^ >>11, multiplier-free (VPU u32 multiply is
                # emulated); the xor-shift breaks affine collision
                # structure (hashmatch.poly_hash)
                h = ((h << U32(8)) + h + shift(l - 1).astype(U32)) \
                    .astype(U32)
                h = (h ^ (h >> U32(11))).astype(U32)
                extend_windows(l)
                got = by_len.get(l)
                if got is None:
                    continue
                li, gi = got
                c1h = _mul_terms(h, _C1_TERMS)
                best, bestb = probe_class(li, gi, classes[gi], best,
                                          bestb, c1h, h)

            # outputs are grid-blocked (TILE_ROWS, 128) windows: only the
            # live tile sits in VMEM, freeing ~8 MB/MB of text for the
            # hash tables (the trainer's big-pool supersets need it)
            out_ref[:] = best[:TILE_ROWS]
            if has_space:
                outb_ref[:] = bestb[:TILE_ROWS]

        return kernel

    part_kernels = [make_part_kernel(part, pi == 0)
                    for pi, part in enumerate(parts)]
    baked_extra = jnp.asarray(smem_scalars(tables))

    @jax.jit
    def match(text, n=None, tabs=None, space_empty=None):
        """tabs: optional runtime table tuple (flat_tables) — same
        geometry as the build tables; defaults to the baked arrays.
        space_empty: the smem_scalars vector ([space_empty+1, ovf+1...],
        possibly candidate-masked); defaults to the build vocabulary's."""
        N = text.shape[0]
        if n is None:
            n = N
        if space_empty is None:
            space_empty = baked_extra
        rows = N // 128
        n_tiles = rows // TILE_ROWS
        t2 = jnp.concatenate([
            text.reshape(rows, 128),
            jnp.zeros((MARGIN_ROWS, 128), text.dtype)])
        out_shape = jax.ShapeDtypeStruct((rows, 128), jnp.int32)
        smem = jnp.concatenate([
            jnp.asarray(n, jnp.int32).reshape(1),
            jnp.asarray(space_empty, jnp.int32).reshape(-1)])
        if tabs is None:
            tabs = baked_tabs
        out_spec = pl.BlockSpec((TILE_ROWS, 128), lambda i: (i, 0))
        m = mb = None
        for pi, part in enumerate(parts):
            ptabs = part_tabs(tabs, part)
            n_vmem_in = 1 + len(ptabs)
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
            in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)
                         for _ in range(n_vmem_in)]
            args = [smem, t2, *ptabs]
            if has_space:
                out, outb = pl.pallas_call(
                    part_kernels[pi],
                    out_shape=(out_shape, out_shape),
                    grid=(n_tiles,),
                    in_specs=in_specs,
                    out_specs=(out_spec, out_spec),
                    interpret=interpret,
                )(*args)
            else:
                out = pl.pallas_call(
                    part_kernels[pi],
                    out_shape=out_shape,
                    grid=(n_tiles,),
                    in_specs=in_specs,
                    out_specs=out_spec,
                    interpret=interpret,
                )(*args)
                outb = None
            if m is None:
                m, mb = out, outb
            else:
                # disjoint length sets: the longer match wins
                m = jnp.where((out & 63) > (m & 63), out, m)
                if has_space:
                    mb = jnp.where((outb & 63) > (mb & 63), outb, mb)
        if has_space:
            return (m.reshape(-1).astype(jnp.uint32),
                    mb.reshape(-1).astype(jnp.uint32))
        return m.reshape(-1).astype(jnp.uint32)

    return match


def reference_match(tables: HashMatchTables, data: bytes) -> np.ndarray:
    """Host oracle over the same tables (hashmatch.host_longest_match)."""
    from .hashmatch import host_longest_match
    out = np.zeros(len(data), np.uint32)
    for p in range(len(data)):
        idx, length = host_longest_match(tables, data, p)
        if length:
            out[p] = (idx << 6) | length
    return out
