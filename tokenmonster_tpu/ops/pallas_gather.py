"""Shared Mosaic gather primitive: per-lane (row, lane) table fetch in the
(groups, 128) position layout.

The TPU VPU's only fast dynamic gather is the within-row lane shuffle
(``take_along_axis(..., axis=1)``); fetching ``plane[row[p], lane[p]]``
therefore costs one lane-shuffle per table row plus a row-select.  Round 3
used a one-hot select-sum (~3x the table rows in element ops); this is the
round-5 replacement: ONE take_along per plane per 128-position group, then
a HALVING row-select by the row index — log2 levels of where-select whose
total work is ~1x the table rows — shared across all planes fetched at the
same (row, lane).

Works for any (non-power-of-two) logical row count: each level splits rows
[0, k) / [k, n) with k = ceil(n/2); lanes selecting the top part have
idx' < n - k, so the garbage pad rows appended to the top are never the
finally-selected row for them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BCAST_ROWS = 4   # tables with <= this many logical rows broadcast each row
                 # over the whole tile + select chain (cheaper than the
                 # group scan when padding dominates)


def row_select(G, idx, r_log: int):
    """out[0, c] = G[idx[0, c], c] — per-lane halving row-select with no
    lane shuffle (the lane IS the index's lane).  G: (R, 128) with
    R >= r_log; idx: (1, 128) int32 in [0, r_log)."""
    cur = G[:r_log] if G.shape[0] != r_log else G
    n_r = r_log
    while n_r > 1:
        k = (n_r + 1) // 2
        ge = idx >= k
        geb = jnp.broadcast_to(ge, (k, 128))
        top = cur[k:n_r]
        if n_r - k < k:
            top = jnp.concatenate([top, cur[:2 * k - n_r]], axis=0)
        cur = jnp.where(geb, top, cur[:k])
        idx = idx - jnp.where(ge, k, 0)
        n_r = k
    return cur


def fetch_planes(planes, srow, slane, r_log: int, n_groups: int):
    """vals[i][g, c] = planes[i][srow[g, c], slane[g, c]].

    planes: list of (R8, 128) arrays (R8 a multiple of 8 — Mosaic's gather
    lowering rejects sub-8-sublane operands); r_log <= R8 logical rows.
    srow/slane: (n_groups, 128) int32.  Returns (n_groups, 128) per plane.
    """
    if r_log <= BCAST_ROWS:
        outs = []
        shape = (n_groups, 128)
        for pv in planes:
            vals = [jnp.take_along_axis(
                jnp.broadcast_to(pv[r:r + 1, :], shape), slane, axis=1)
                for r in range(r_log)]
            out = vals[0]
            for r in range(1, r_log):
                out = jnp.where(srow == r, vals[r], out)
            outs.append(out)
        return outs
    outs = [[] for _ in planes]
    R8 = planes[0].shape[0]
    for gq in range(n_groups):
        sl = jnp.broadcast_to(slane[gq:gq + 1, :], (R8, 128))
        curs = [jnp.take_along_axis(pv, sl, axis=1)[:r_log]
                for pv in planes]
        idx = srow[gq:gq + 1, :]
        n_r = r_log
        while n_r > 1:
            k = (n_r + 1) // 2
            ge = idx >= k
            geb = jnp.broadcast_to(ge, (k, 128))
            nxt = []
            for cur in curs:
                top = cur[k:n_r]
                if n_r - k < k:
                    top = jnp.concatenate([top, cur[:2 * k - n_r]], axis=0)
                nxt.append(jnp.where(geb, top, cur[:k]))
            curs = nxt
            idx = idx - jnp.where(ge, k, 0)
            n_r = k
        for i, cur in enumerate(curs):
            outs[i].append(cur)
    return [jnp.concatenate(o, axis=0) for o in outs]
