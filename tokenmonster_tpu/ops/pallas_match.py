"""Pallas longest-match kernel: VMEM hash-table probes in position layout.

Replaces the XLA AC-DFA match phase (ops/match.py), whose 2 scalar gathers
per byte cap it at ~27 MB/s on this TPU (XLA lowers gathers to ~94 M/s).
Every byte position probes each key-length class's displaced hash table
(ops/hashmatch.py).  Tables are FIELD-MAJOR: slot s lives at (s>>7, s&127)
of every field plane, fields pack 3 key bytes each (f32-exact triples) plus
the dictionary index.  A probe is then, per 128-position group:
  lane-shuffle each field plane by the slot lanes (take_along_axis — the
  fast Mosaic shuffle), mask with the slot-row one-hot, reduce over rows
and the fetched triples are compared against window triples built from
static text shifts — an EXACT match test, no fingerprint uncertainty.

Everything stays in the (rows, 128) position layout: no transposes, no
per-position row vectors, no MXU layout gymnastics.  Hashing is the u32
polynomial recurrence (full-speed in Mosaic, ~1.8 G mul/s measured; never
hash in XLA where u32 multiply runs ~7 M/s).

Output: m_tab packed (idx << 6) | len, 0 = no match — the ops/match.py
contract (longest-substring semantics of go/tokenmonster.go:1049,
tokenmonster-cpp/src/tokenmonster.cpp:786-877).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .hashmatch import C1, C2, M_MULT, SEED, HashMatchTables

TILE_ROWS = 16       # 128-position groups per grid step (2048 positions)
MARGIN_ROWS = 1      # extra text rows visible per step (windows read <= 43)

U32 = jnp.uint32


def _naf_terms(c: int):
    """Signed power-of-two decomposition (non-adjacent form) of a u32
    constant: c = sum(sign << k).  Used to lower the hash-mix constant
    multiplies to shift-add chains — value-identical mod 2^32 to the u32
    multiply, but ~3x cheaper than the VPU's emulated 32-bit multiply."""
    terms = []
    c = int(c)
    k = 0
    while c:
        if c & 1:
            if c & 3 == 3:
                terms.append((k, -1))
                c += 1
            else:
                terms.append((k, 1))
                c -= 1
        c >>= 1
        k += 1
    return terms


_C1_TERMS = _naf_terms(int(C1))
_C2_TERMS = _naf_terms(int(C2))


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


def _pad_rows8(a):
    """Pad a (..., R, 128) plane so R is a multiple of 8 (Mosaic's gather
    lowering rejects sub-8-sublane operands)."""
    r = a.shape[-2]
    r8 = max(8, -(-r // 8) * 8)
    if r8 == r:
        return a
    pad = np.zeros(a.shape[:-2] + (r8 - r, 128), a.dtype)
    return np.concatenate([a, pad], axis=-2)


def _single_tbl(single, alive=None):
    """(2,128) f32 direct table of idx+1 by byte value, optionally masked."""
    sv = single.astype(np.int64)
    if alive is not None:
        live = alive[np.maximum(sv, 0)]
        sv = np.where((sv >= 0) & live, sv, -1)
    return jnp.asarray((sv + 1).astype(np.float32).reshape(2, 128))


def _class_device_tables(classes, alive=None):
    """Per-class field + displacement planes in kernel layout.  With
    ``alive`` (bool per dictionary index), the idx+1 field plane of dead
    tokens is zeroed — the masked tables behave as the sub-dictionary."""
    field_tbls = []
    for c in classes:
        f = _pad_rows8(c.fields).astype(np.float32)
        if alive is not None:
            idxp = f[-1]                      # idx+1 plane
            live = alive[np.maximum(idxp.astype(np.int64) - 1, 0)]
            f = f.copy()
            f[-1] = np.where((idxp > 0) & live, idxp, 0.0)
        field_tbls.append(jnp.asarray(f))
    disp_tbls = []
    for c in classes:
        B = 1 << c.b_bits
        padded = np.zeros((max(1, -(-B // 128)) * 128,), np.float32)
        padded[:B] = c.disp.astype(np.float32)
        disp_tbls.append(jnp.asarray(_pad_rows8(padded.reshape(-1, 128)),
                                     jnp.float32))
    return field_tbls, disp_tbls


def build_device_tables(tables: HashMatchTables):
    """Device-resident arrays: per-class field planes + displacement planes
    + the 256-entry single-byte table."""
    field_tbls, disp_tbls = _class_device_tables(tables.classes)
    return field_tbls, disp_tbls, _single_tbl(tables.single)


def flat_tables(tables: HashMatchTables, alive: np.ndarray | None = None):
    """The flat runtime-argument tuple for ``match(text, n, tabs=...)`` —
    same order the kernel reads its refs.  With ``alive`` (bool per
    dictionary index), slots of dead tokens have their index field zeroed
    and dead singles cleared: the SAME placement (geometry, salts,
    displacements) then behaves as the sub-dictionary, which is how the
    trainer scores candidate vocabularies without rebuilding or
    recompiling (superset placement, per-candidate masking)."""
    f_main, d_main = _class_device_tables(tables.classes, alive)
    args = [*f_main, *d_main]
    if tables.has_space:
        f_sp, d_sp = _class_device_tables(tables.space_classes, alive)
        args += [*f_sp, *d_sp, _single_tbl(tables.single, alive),
                 _single_tbl(tables.space_single, alive)]
    else:
        args.append(_single_tbl(tables.single, alive))
    return tuple(args)


def smem_scalars(tables: HashMatchTables,
                 alive: np.ndarray | None = None) -> np.ndarray:
    """The per-call SMEM scalar vector (excluding n, which is prepended by
    the wrapper): [space_empty+1, overflow_idx+1 ...] — the bare-prefix
    token and the direct-compare overflow keys (full-hash collisions),
    each 0 when absent or masked dead for the candidate."""
    se = tables.space_empty
    if se < 0 or (alive is not None and not alive[se]):
        se_v = 0
    else:
        se_v = se + 1
    out = [se_v]
    for classes in (tables.classes, tables.space_classes or []):
        for c in classes:
            for i in (c.ovf_idx or []):
                dead = alive is not None and not alive[i]
                out.append(0 if dead else i + 1)
    return np.asarray(out, np.int32)



def make_match_kernel(tables: HashMatchTables, interpret: bool = False,
                      ablate: frozenset = frozenset()):
    """fn(text u8[N]) -> m_tab u32[N], or (m_tab, mb_tab) when the tables
    carry the space-stripped structure (delete-token vocabularies).  N must
    be a multiple of 128*TILE_ROWS; the caller guarantees >= 128 zero bytes
    of padding after real data (windows read ahead; an extra margin row is
    appended here).  mb_tab packs (idx << 6) | full_len where full_len
    includes the virtual space prefix (the ``lilbuf`` probe contract,
    go/tokenmonster.go:1029-1036).  ``ablate`` is a perf-debugging knob set:
    {"seq_sum", "one_field", "no_probe", "no_disp"}."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    classes = tables.classes
    n_cls = len(classes)
    has_space = tables.has_space
    sp_classes = tables.space_classes or []
    n_sp = len(sp_classes)
    lil_off = tables.lil_off
    max_len = max((c.length for c in classes), default=1)
    if sp_classes:
        max_len = max(max_len, max(c.length for c in sp_classes))
    R_TOT = TILE_ROWS + MARGIN_ROWS
    # SMEM layout: [n, space_empty+1, ovf...] — per-class overflow offsets
    ovf_off = []
    acc = 0
    for c in list(classes) + list(sp_classes):
        ovf_off.append(acc)
        acc += len(c.ovf_keys or ())
    n_ovf = acc
    field_tbls, disp_tbls, single_tbl = build_device_tables(tables)
    sp_field_tbls, sp_disp_tbls = _class_device_tables(sp_classes)
    if has_space:
        sp_single_tbl = jnp.asarray(
            (tables.space_single.astype(np.int64) + 1)
            .astype(np.float32).reshape(2, 128))

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
        # absolute byte position of every element; matches must end <= n
        # (the reference never matches past the valid length — the XLA
        # pipeline enforces this with RESET sentinels, go/tokenmonster.go)
        pos_abs = (base_row + rowi) * 128 + lane
        n_valid = n_ref[0]
        shift_cache = {0: t}

        def shift(k):
            """sh[p] = flat_text[p + k] in (R_TOT, 128) layout, k < 128."""
            got = shift_cache.get(k)
            if got is not None:
                return got
            a = pltpu.roll(t, 128 - k, 1)
            c_ = pltpu.roll(a, R_TOT - 1, 0)     # next-row carry
            out = jnp.where(lane < 128 - k, a, c_)
            shift_cache[k] = out
            return out

        triple_cache = {}

        def wtriple(j, nbytes):
            """window triple j with nbytes (1..3) live bytes."""
            got = triple_cache.get((j, nbytes))
            if got is not None:
                return got
            v = shift(3 * j)
            if nbytes >= 2:
                v = v + shift(3 * j + 1) * 256
            if nbytes >= 3:
                v = v + shift(3 * j + 2) * 65536
            triple_cache[(j, nbytes)] = v
            return v

        h = jnp.full((R_TOT, 128), SEED, U32)
        best = jnp.zeros((R_TOT, 128), jnp.int32)

        def single_lookup(ref):
            """256-entry direct table (2 x 128) lookup by byte value."""
            s_all = ref[:]
            r0 = jnp.take_along_axis(
                jnp.broadcast_to(s_all[0:1, :], (R_TOT, 128)), t & 127,
                axis=1)
            r1 = jnp.take_along_axis(
                jnp.broadcast_to(s_all[1:2, :], (R_TOT, 128)), t & 127,
                axis=1)
            return jnp.where(t < 128, r0, r1).astype(jnp.int32)

        # length-1 keys: direct table
        sidx1 = single_lookup(single_ref)
        best = jnp.where((sidx1 > 0) & (pos_abs + 1 <= n_valid),
                         ((sidx1 - 1) << 6) | 1, best)

        if has_space:
            # forward-delete base cases: the bare prefix token matches every
            # position (the probe window always begins with the virtual
            # space), stripped single-byte keys via their direct table.
            # space_empty arrives as an SMEM scalar (idx+1, 0=none) so the
            # trainer can mask it per candidate without recompiling.
            se = n_ref[1]
            bestb = (jnp.zeros((R_TOT, 128), jnp.int32)
                     + jnp.where(se > 0, ((se - 1) << 6) | lil_off, 0))
            spidx1 = single_lookup(sp_single_ref)
            bestb = jnp.where((spidx1 > 0) & (pos_abs + 1 <= n_valid),
                              ((spidx1 - 1) << 6) | (1 + lil_off), bestb)

        def plane_lookup(plane_ref, prow, plane_lane, real_rows=None):
            """val[p] = plane[prow[p], plane_lane[p]] per 128-position group;
            returns (R_TOT, 128).  take_along lane shuffle + row-one-hot
            select-sum, all in position layout.  Tables with few real rows
            (``real_rows`` <= 4 — the long-key tail classes) skip the
            per-group row scan: one broadcast lane-shuffle per real row +
            a select chain over the whole tile."""
            plane = plane_ref[:]
            if real_rows is not None and real_rows <= 4:
                vals = []
                for r in range(real_rows):
                    vals.append(jnp.take_along_axis(
                        jnp.broadcast_to(plane[r:r + 1, :], (R_TOT, 128)),
                        plane_lane, axis=1))
                out = vals[0]
                for r in range(1, real_rows):
                    out = jnp.where(prow == r, vals[r], out)
                return out
            PR = plane.shape[0]
            rows_out = []
            for gq in range(R_TOT):
                sl = plane_lane[gq:gq + 1, :]
                sr = prow[gq:gq + 1, :]
                shuf = jnp.take_along_axis(
                    plane, jnp.broadcast_to(sl, (PR, 128)), axis=1)
                ohT = (jnp.broadcast_to(sr, (PR, 128))
                       == jax.lax.broadcasted_iota(jnp.int32, (PR, 128), 0))
                masked = jnp.where(ohT, shuf, 0.0)
                if "seq_sum" in ablate:
                    val = jnp.sum(masked, axis=0, keepdims=True)
                else:
                    # log-tree reduction over rows: Mosaic lowers a plain
                    # axis-0 sum as PR sequential row adds; halving static
                    # slices costs 2x elements total instead of PR passes
                    cur = masked
                    n_r = PR
                    while n_r > 1:
                        half = n_r // 2
                        nxt = cur[:half, :] + cur[half:2 * half, :]
                        if n_r % 2:
                            tail = cur[2 * half:, :]
                            if half == 1:
                                nxt = nxt + tail
                            else:
                                nxt = jnp.concatenate(
                                    [nxt[:half - 1, :],
                                     nxt[half - 1:half, :] + tail], axis=0)
                        cur = nxt
                        n_r = half
                    val = cur
                rows_out.append(val)
            return jnp.concatenate(rows_out, axis=0)

        def probe_class(c, fref, dref, l, cur_best, out_len, ovf_base,
                        c1h):
            """Probe class ``c`` (stripped key length l) against the running
            hash; on exact hit store ((idx) << 6) | out_len into cur_best.
            Overflow keys (full-hash collisions, excluded from the table)
            are direct-compared against the text windows, their masked
            indices read from SMEM slots starting at ``ovf_base``."""
            rr_f = -(-(1 << c.s_bits) // 128)      # real field-plane rows
            rr_d = max(1, -(-(1 << c.b_bits) // 128))
            if c.b_bits:
                bucket = (_mul_terms(h, _C1_TERMS)
                          >> U32(32 - c.b_bits)).astype(jnp.int32)
            else:
                bucket = jnp.zeros((R_TOT, 128), jnp.int32)
            g = (_mul_terms((h ^ U32(c.salt)).astype(U32), _C2_TERMS)
                 >> U32(32 - c.s_bits)).astype(jnp.int32)
            if "no_disp" in ablate or ("no_probe" in ablate
                                       and "d_only" not in ablate):
                d = jnp.zeros((R_TOT, 128), jnp.int32)
            else:
                d = plane_lookup(dref, bucket >> 7, bucket & 127,
                                 real_rows=rr_d).astype(jnp.int32)
            slot = (g + d) & ((1 << c.s_bits) - 1)
            srow = slot >> 7
            slane = slot & 127

            if "no_probe" in ablate or "d_only" in ablate:
                return cur_best ^ slot  # keep slot math alive
            nf = c.n_key_fields
            if "one_field" in ablate:
                nf = 1
            mism = jnp.zeros((R_TOT, 128), jnp.bool_)
            for j in range(nf):
                nbytes = min(3, l - 3 * j)
                got = plane_lookup(fref.at[j], srow, slane,
                                   real_rows=rr_f).astype(jnp.int32)
                mism = mism | (got != wtriple(j, nbytes))
            idx1 = plane_lookup(fref.at[c.n_key_fields], srow, slane,
                                real_rows=rr_f).astype(jnp.int32)
            hit = (~mism) & (idx1 > 0) & (pos_abs + l <= n_valid)
            cur_best = jnp.where(hit, ((idx1 - 1) << 6) | out_len, cur_best)
            for j, kk in enumerate(c.ovf_keys or ()):
                ov = n_ref[2 + ovf_base + j]
                oh = (ov > 0) & (pos_abs + l <= n_valid)
                for f in range(c.n_key_fields):
                    nbytes = min(3, l - 3 * f)
                    const = (kk[3 * f]
                             + (256 * kk[3 * f + 1] if nbytes >= 2 else 0)
                             + (65536 * kk[3 * f + 2] if nbytes >= 3 else 0))
                    oh = oh & (wtriple(f, nbytes) == const)
                cur_best = jnp.where(oh, ((ov - 1) << 6) | out_len,
                                     cur_best)
            return cur_best

        ci = 0
        si = 0
        for l in range(1, max_len + 1):
            # (h*257 + b) ^ >>11, multiplier-free (VPU u32 multiply is
            # emulated); the xor-shift breaks affine collision structure
            # that pure multiplicative updates suffer (hashmatch.poly_hash)
            h = ((h << U32(8)) + h + shift(l - 1).astype(U32)).astype(U32)
            h = (h ^ (h >> U32(11))).astype(U32)
            has_main = ci < n_cls and classes[ci].length == l
            has_sp = (has_space and si < n_sp
                      and sp_classes[si].length == l)
            c1h = _mul_terms(h, _C1_TERMS) if (has_main or has_sp) else None
            if has_main:
                best = probe_class(classes[ci], refs[ci], refs[n_cls + ci],
                                   l, best, l, ovf_off[ci], c1h)
                ci += 1
            if has_sp:
                # same stripped-prefix hash stream; reported length includes
                # the virtual space prefix
                bestb = probe_class(
                    sp_classes[si], refs[2 * n_cls + si],
                    refs[2 * n_cls + n_sp + si], l, bestb, l + lil_off,
                    ovf_off[n_cls + si], c1h)
                si += 1

        out_ref[pl.ds(base_row, TILE_ROWS), :] = best[:TILE_ROWS]
        if has_space:
            outb_ref[pl.ds(base_row, TILE_ROWS), :] = bestb[:TILE_ROWS]

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
        n_vmem_in = 2 * n_cls + 2 * n_sp + (3 if has_space else 2)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)
                     for _ in range(n_vmem_in)]
        out_shape = jax.ShapeDtypeStruct((rows, 128), jnp.int32)
        smem = jnp.concatenate([
            jnp.asarray(n, jnp.int32).reshape(1),
            jnp.asarray(space_empty, jnp.int32).reshape(-1)])
        if tabs is None:
            if has_space:
                tabs = (*field_tbls, *disp_tbls, *sp_field_tbls,
                        *sp_disp_tbls, single_tbl, sp_single_tbl)
            else:
                tabs = (*field_tbls, *disp_tbls, single_tbl)
        args = [smem, t2, *tabs]
        if has_space:
            out, outb = pl.pallas_call(
                kernel,
                out_shape=(out_shape, out_shape),
                grid=(n_tiles,),
                in_specs=in_specs,
                out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                           pl.BlockSpec(memory_space=pltpu.VMEM)),
                interpret=interpret,
            )(*args)
            return (out.reshape(-1).astype(jnp.uint32),
                    outb.reshape(-1).astype(jnp.uint32))
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(*args)
        return out.reshape(-1).astype(jnp.uint32)

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
