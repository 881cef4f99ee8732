"""Per-candidate runtime state for the Pallas trainer fast path.

The scorer's kernels are compiled once on the SUPERSET vocabulary
(trainvocab.CandidateScorer.prepare_pallas).  Each candidate (a subset of
the pool) is expressed as runtime arguments at superset shapes:
  - masked CHD tables (dead slots' index fields zeroed),
  - candidate metadata planes remapped to superset dictionary positions,
  - the candidate id table ids3f (superset idx * 3 + branch -> emitted id).
Both dictionaries sort with the same comparator, so a candidate token's
dictionary index equals its rank among alive superset entries — verified
here per candidate before scoring.
"""

from __future__ import annotations

import numpy as np


def candidate_runtime_state(pal: dict, cand):
    """(tabs_args, space_empty, planes, bb, ids3f, delete_token, rank)
    for the candidate, or None when the candidate is incompatible with
    the prepared superset (unknown token / delete-config mismatch).
    ``rank`` is None except in the big-superset remap mode (pal["remap"]),
    where it maps superset indices to candidate-local ranks and the
    planes/ids are candidate-sized (pow2-row buckets)."""
    import jax.numpy as jnp

    from ..ops.pallas_decide import build_meta_planes
    from ..ops.pallas_match import flat_tables, smem_scalars

    v_sup = pal["v_sup"]
    sup_index = pal["sup_index"]
    n_sup = len(v_sup.tokens)
    has_delete = (cand.delete_token != 0xFFFFFF)
    if has_delete != pal["has_delete"] or cand.charset != v_sup.charset:
        return None
    # the decide kernel bakes the superset's unk config (has_unk + literal
    # unk id in the packed token words) — a candidate with a different unk
    # config cannot reuse the compiled kernels
    if (cand.unk_token != 0xFFFFFF) != (v_sup.unk_token != 0xFFFFFF) or (
            cand.unk_token != 0xFFFFFF
            and (cand.unk_token & 0xFFFFFF) != (v_sup.unk_token & 0xFFFFFF)):
        return None

    alive = np.zeros(n_sup, bool)
    pos = np.empty(len(cand.tokens), np.int64)
    for ci, t in enumerate(cand.tokens):
        i = sup_index.get(bytes(t))
        if i is None:
            return None
        alive[i] = True
        pos[ci] = i
    # rank-order check: candidate index ci must equal the alive-rank of its
    # superset position (same sort comparator in both dictionaries)
    if not np.all(np.diff(pos) > 0):
        return None

    planes_c, bb_c = build_meta_planes(cand)
    n_planes = planes_c.shape[0]
    if pal.get("remap"):
        # big-superset mode: the decide kernel runs on CANDIDATE-sized
        # meta planes (matched indices remap to alive-ranks on device);
        # rows bucket to powers of two so jitted step shapes are stable
        nc = len(cand.tokens)
        rows = 8
        while rows * 128 < nc:
            rows <<= 1
        planes_cap = np.zeros((n_planes, rows, 128), planes_c.dtype)
        planes_cap.reshape(n_planes, -1)[:, :nc] =             planes_c.reshape(n_planes, -1)[:, :nc]
        ids3 = np.zeros((rows * 128, 3), np.uint32)
        ids3[:nc, 0] = cand.id
        ids3[:nc, 1] = cand.id1
        ids3[:nc, 2] = cand.id2
        # alive-rank per superset index (candidate dict order == alive
        # order, checked above)
        rank = np.cumsum(alive).astype(np.int32) - 1
        rank[~alive] = 0
        tabs_args = flat_tables(pal["tabs"], alive)
        se = smem_scalars(pal["tabs"], alive)
        del_tok = int(cand.delete_token) & 0xFFFFFF
        return (tabs_args, se, jnp.asarray(planes_cap), jnp.asarray(bb_c),
                jnp.asarray(ids3.reshape(-1)), del_tok,
                jnp.asarray(rank))

    # candidate metadata at superset positions
    Rs = max(8, -(-n_sup // 128 // 8) * 8)
    planes_sup = np.zeros((n_planes, Rs, 128), planes_c.dtype)
    flat = planes_sup.reshape(n_planes, Rs * 128)
    cflat = planes_c.reshape(n_planes, -1)
    flat[:, pos] = cflat[:, :len(cand.tokens)]

    ids3 = np.zeros((Rs * 128, 3), np.uint32)
    ids3[pos, 0] = cand.id
    ids3[pos, 1] = cand.id1
    ids3[pos, 2] = cand.id2
    ids3f = ids3.reshape(-1)

    tabs_args = flat_tables(pal["tabs"], alive)
    se = smem_scalars(pal["tabs"], alive)
    del_tok = int(cand.delete_token) & 0xFFFFFF
    return (tabs_args, se,
            jnp.asarray(planes_sup), jnp.asarray(bb_c),
            jnp.asarray(ids3f), del_tok, None)
