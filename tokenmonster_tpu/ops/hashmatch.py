"""Per-length-class displaced hash tables for the Pallas longest-match
kernel (ops/pallas_match.py).

The reference finds longest matches with a length-bucketed packed-key
search (pansearch; tokenmonster-cpp/src/tokenmonster.cpp:491-877) — a
pointer-chasing structure XLA cannot use (scalar gathers cap at ~94 M/s on
this TPU).  The MXU-native reformulation: for every position p and every
key length l, test membership of text[p:p+l] with a one-hot row sweep over
a VMEM-resident hash table (measured >200 M probes/s for 512x128 tables).

Exactness: each slot stores the key's raw bytes as bf16 byte-columns; the
kernel compares ALL fetched bytes against the text window, so a hit is an
exact dictionary match — no fingerprint uncertainty anywhere.

Placement is CHD-style (compress-hash-displace): keys hash to buckets; a
per-bucket displacement is searched so every key lands in a distinct slot;
lookup = hash -> bucket displacement -> slot, collision-free by build.

Hash family (all u32 wraparound arithmetic — fast inside Mosaic kernels,
~1.8 G mul/s measured; AVOID in XLA where u32 multiply is ~7 M/s):
  h(p, l) = poly hash of bytes, h_{l+1} = h_l * M + b[p+l], h_0 = SEED
  bucket  = (h * C1) >> (32 - log2 B)
  slot    = (((h ^ salt) * C2) >> (32 - log2 S) + d[bucket]) & (S - 1)
(salt is searched per class at build so within-bucket g-collisions — which
make a bucket unplaceable — are reshuffled instead of escalating the table
size.)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

M_MULT = np.uint32(257)           # mult-free in-kernel: (h<<8)+h
C1 = np.uint32(0x9E3779B1)
C2 = np.uint32(0x85EBCA6B)
SEED = np.uint32(0x811C9DC5)
IDX_BYTES = 3                     # dictionary index bytes per slot


def poly_hash(key: bytes) -> np.uint32:
    """Per-byte recurrence h = (h*257 + b) ^ (h*257+b)>>11 — mult-free in
    the kernel ((h<<8)+h) with an xor-shift to break the affine collision
    structure pure multiplicative updates suffer."""
    h = int(SEED)
    for b in key:
        h = (h * 257 + b) & 0xFFFFFFFF
        h ^= h >> 11
    return np.uint32(h)


def _top_bits(x: np.uint32, mult: np.uint32, bits: int) -> int:
    if bits == 0:
        return 0
    v = np.uint32((np.uint64(x) * np.uint64(mult)) & np.uint64(0xFFFFFFFF))
    return int(v) >> (32 - bits)


@dataclass
class ClassTable:
    """One length class's displaced hash table, in kernel layout.

    Kernel layout is FIELD-MAJOR: slot s lives at (row s>>7, lane s&127) of
    every field plane; field j < n_key_fields packs key bytes 3j..3j+2 as
    b0 + 256*b1 + 65536*b2 (f32-exact, pad bytes zero), and the last field
    is the dictionary index + 1 (0 = empty slot).  A slot fetch is then a
    per-field (lane-shuffle + row-select-sum) in the position layout — no
    transposes or per-position row vectors anywhere.
    """
    length: int                  # key length (bytes)
    cols: int                    # bytes per slot = length + IDX_BYTES
    spr: int                     # slots per 128-lane row
    s_bits: int                  # log2(total slots)
    b_bits: int                  # log2(buckets)
    salt: int                    # g-hash salt (see module doc)
    rows: np.ndarray             # (R, 128) uint8 slot bytes (host prober)
    occupied: np.ndarray         # (S,) bool
    disp: np.ndarray             # (B,) int32 displacements
    fields: np.ndarray = None    # (n_fields, S/128, 128) f32 kernel planes
    n_keys: int = 0
    # keys whose FULL 32-bit hash collides with another key can never be
    # displaced apart (same bucket, same g for every salt) — they leave the
    # hash table and get direct-compare probes in the kernel instead
    ovf_keys: list = None        # list[bytes]
    ovf_idx: list = None         # list[int] dictionary indices

    @property
    def n_rows(self) -> int:
        return self.rows.shape[0]

    @property
    def n_key_fields(self) -> int:
        return -(-self.length // 3)


def build_class_table(keys: list[bytes], indices: list[int],
                      load: float = 0.95) -> ClassTable:
    """Build the displaced table for one length class.

    Starts at the smallest power-of-two slot count >= K (CHD displacement
    with salt retries routinely places at ~0.9+ load; probe cost in the
    kernel is proportional to table rows, so density is throughput) and
    grows only on placement failure."""
    length = len(keys[0])
    # full-hash collisions are unplaceable at any size/salt (identical h
    # => identical bucket AND g): route all but the first of each h-group
    # to direct-compare overflow probes
    ovf_keys: list = []
    ovf_idx: list = []
    seen: dict = {}
    keep_keys: list = []
    keep_idx: list = []
    for k, i in zip(keys, indices):
        h = int(poly_hash(k))
        if h in seen:
            ovf_keys.append(k)
            ovf_idx.append(i)
        else:
            seen[h] = True
            keep_keys.append(k)
            keep_idx.append(i)
    keys, indices = keep_keys, keep_idx
    K = len(keys)
    cols = length + IDX_BYTES
    spr = max(1, 128 // cols)
    s_bits = 2
    while (1 << s_bits) * load < K or (1 << s_bits) < 2 * spr:
        s_bits += 1

    h_all = [poly_hash(k) for k in keys]
    salt = 0
    for attempt in range(24):
        S = 1 << s_bits
        b_bits = max(0, s_bits - 2)   # ~4 keys/bucket (8/bucket was tried:
                                      # placement failures grow the slot
                                      # tables and cost more field rows
                                      # than the halved disp planes save)
        B = 1 << b_bits
        salt = (attempt * 0x9E3779B9) & 0xFFFFFFFF
        # group keys by bucket
        buckets: list[list[int]] = [[] for _ in range(B)]
        g_all = [_top_bits(np.uint32(int(h) ^ salt), C2, s_bits)
                 for h in h_all]
        for i, h in enumerate(h_all):
            buckets[_top_bits(h, C1, b_bits)].append(i)
        # place buckets largest-first
        order = sorted(range(B), key=lambda b: -len(buckets[b]))
        occupied = np.zeros(S, bool)
        slot_of = np.full(K, -1, np.int64)
        disp = np.zeros(B, np.int32)
        ok = True
        for b in order:
            ks = buckets[b]
            if not ks:
                continue
            placed = False
            for d in range(min(S, 4096)):
                slots = [(g_all[i] + d) & (S - 1) for i in ks]
                if len(set(slots)) == len(slots) and \
                        not any(occupied[s] for s in slots):
                    for i, s in zip(ks, slots):
                        occupied[s] = True
                        slot_of[i] = s
                    disp[b] = d
                    placed = True
                    break
            if not placed:
                ok = False
                break
        if ok:
            break
        if attempt % 3 == 2:   # two salt reshuffles before growing
            s_bits += 1
    else:
        raise RuntimeError(f"CHD build failed for length {length} ({K} keys)")

    R = -(-S // spr)
    rows = np.zeros((R, 128), np.uint8)
    for i, key in enumerate(keys):
        s = int(slot_of[i])
        r, c0 = divmod(s, spr)
        c0 *= cols
        kb = np.frombuffer(key, np.uint8)
        rows[r, c0:c0 + length] = kb
        # idx stored +1 so an all-zero empty slot can never alias a match
        # (token bytes may legitimately be zeros)
        idx = indices[i] + 1
        rows[r, c0 + length] = idx & 0xFF
        rows[r, c0 + length + 1] = (idx >> 8) & 0xFF
        rows[r, c0 + length + 2] = (idx >> 16) & 0xFF
    # field-major planes for the kernel: key triples + idx(+1)
    S_rows = max(1, -(-S // 128))
    nf = -(-length // 3) + 1
    fields = np.zeros((nf, S_rows, 128), np.float32)
    for i, key in enumerate(keys):
        s = int(slot_of[i])
        r7, l7 = divmod(s, 128)
        kb = np.zeros(nf * 3, np.int64)
        kb[:length] = np.frombuffer(key, np.uint8)
        for j in range(nf - 1):
            fields[j, r7, l7] = (kb[3 * j] + 256 * kb[3 * j + 1]
                                 + 65536 * kb[3 * j + 2])
        fields[nf - 1, r7, l7] = indices[i] + 1
    return ClassTable(length=length, cols=cols, spr=spr, s_bits=s_bits,
                      b_bits=b_bits, salt=salt, rows=rows,
                      occupied=occupied, disp=disp, fields=fields, n_keys=K,
                      ovf_keys=ovf_keys, ovf_idx=ovf_idx)


@dataclass
class HashMatchTables:
    """All class tables + auxiliary arrays for one dictionary.

    ``space_*`` fields hold the forward-delete lookup structure: the
    tokenizer's b-branches probe the dictionary with a space-prefixed window
    (the ``lilbuf`` probes, go/tokenmonster.go:1029-1036, 1088-1108).  Only
    keys that BEGIN with the space prefix can match such a window, so we
    index {k[len(pre):] : pre+x in dict} — the same space-stripped keying as
    the AC space automaton (ops/automaton.py::build_match_automata).  The
    stripped key is a prefix of the text at p, so the kernel's running hash
    stream covers it for free; reported match length includes the prefix."""
    classes: list[ClassTable]
    single: np.ndarray           # (256,) i32: dict index of 1-byte key or -1
    max_len: int
    n_keys: int
    space_classes: list[ClassTable] = None  # stripped-key length classes
    space_single: np.ndarray = None  # (256,) idx of stripped 1-byte key
    space_empty: int = -1        # dict idx of the bare prefix token, or -1
    lil_off: int = 1             # len(space prefix): 1 (UTF-8) / 2 (UTF-16)

    @property
    def has_space(self) -> bool:
        return self.space_classes is not None

    def nbytes(self) -> int:
        total = sum(c.rows.nbytes + c.disp.nbytes for c in self.classes)
        if self.space_classes:
            total += sum(c.rows.nbytes + c.disp.nbytes
                         for c in self.space_classes)
        return total


def build_hashmatch(keys: list[bytes], indices=None,
                    space_prefix: bytes | None = None) -> HashMatchTables:
    """Build tables from dictionary keys (sorted order = index order).

    ``space_prefix`` (b" " for byte/UTF-8 charsets, b" \\x00" for UTF-16-LE)
    additionally builds the space-stripped tables for the forward-delete
    probes; None for vocabularies without a delete token."""
    if indices is None:
        indices = list(range(len(keys)))
    by_len: dict[int, tuple[list, list]] = {}
    single = np.full(256, -1, np.int32)
    max_len = 0
    for k, i in zip(keys, indices):
        max_len = max(max_len, len(k))
        if len(k) == 1:
            single[k[0]] = i
            continue
        by_len.setdefault(len(k), ([], []))
        by_len[len(k)][0].append(bytes(k))
        by_len[len(k)][1].append(i)
    classes = [build_class_table(ks, idxs)
               for ln, (ks, idxs) in sorted(by_len.items())]

    space_classes = None
    space_single = None
    space_empty = -1
    lil_off = len(space_prefix) if space_prefix else 1
    if space_prefix is not None:
        sp_by_len: dict[int, tuple[list, list]] = {}
        space_single = np.full(256, -1, np.int32)
        for k, i in zip(keys, indices):
            if not k.startswith(space_prefix):
                continue
            s = bytes(k[len(space_prefix):])
            if len(s) == 0:
                space_empty = i
            elif len(s) == 1:
                space_single[s[0]] = i
            else:
                sp_by_len.setdefault(len(s), ([], []))
                sp_by_len[len(s)][0].append(s)
                sp_by_len[len(s)][1].append(i)
        space_classes = [build_class_table(ks, idxs)
                         for ln, (ks, idxs) in sorted(sp_by_len.items())]
    return HashMatchTables(classes=classes, single=single, max_len=max_len,
                           n_keys=len(keys), space_classes=space_classes,
                           space_single=space_single, space_empty=space_empty,
                           lil_off=lil_off)


# ---------------- host reference prober (oracle for kernel tests) --------

def host_longest_match(tables: HashMatchTables, data: bytes, p: int):
    """(idx, length) of the longest dictionary match at p; (-1, 0) if none.
    Mirrors the kernel's probe math exactly (same hashes, same layout)."""
    best_idx, best_len = -1, 0
    b = data[p] if p < len(data) else None
    if b is not None and tables.single[b] >= 0:
        best_idx, best_len = int(tables.single[b]), 1
    n = len(data)
    h = int(SEED)
    maxl = min(tables.max_len, n - p)
    by_len = {c.length: c for c in tables.classes}
    for l in range(1, maxl + 1):
        h = (h * 257 + data[p + l - 1]) & 0xFFFFFFFF
        h ^= h >> 11
        c = by_len.get(l)
        if c is None:
            continue
        bucket = _top_bits(np.uint32(h), C1, c.b_bits)
        g = _top_bits(np.uint32(h ^ c.salt), C2, c.s_bits)
        s = (g + int(c.disp[bucket])) & ((1 << c.s_bits) - 1)
        r, c0 = divmod(s, c.spr)
        c0 *= c.cols
        slot = c.rows[r, c0:c0 + c.cols]
        idx1 = int(slot[l]) | (int(slot[l + 1]) << 8) | \
            (int(slot[l + 2]) << 16)
        if idx1 != 0 and bytes(slot[:l]) == data[p:p + l]:
            best_idx, best_len = idx1 - 1, l
        for k, i in zip(c.ovf_keys or (), c.ovf_idx or ()):
            if data[p:p + l] == k:
                best_idx, best_len = i, l
    return best_idx, best_len


def host_longest_space_match(tables: HashMatchTables, data: bytes, p: int):
    """(idx, full_length) of the longest space-prefixed match at p, i.e.
    the longest dictionary key equal to prefix + data[p:p+sl]; full_length
    includes the prefix bytes.  (-1, 0) if none.  Mirrors the kernel's
    space-table probe math exactly."""
    best_idx, best_len = -1, 0
    if tables.space_classes is None:
        return best_idx, best_len
    if tables.space_empty >= 0:
        best_idx, best_len = tables.space_empty, tables.lil_off
    n = len(data)
    b = data[p] if p < n else None
    if b is not None and tables.space_single is not None \
            and tables.space_single[b] >= 0:
        best_idx = int(tables.space_single[b])
        best_len = 1 + tables.lil_off
    h = int(SEED)
    maxl = min(tables.max_len - tables.lil_off, n - p)
    by_len = {c.length: c for c in tables.space_classes}
    for l in range(1, maxl + 1):
        h = (h * 257 + data[p + l - 1]) & 0xFFFFFFFF
        h ^= h >> 11
        c = by_len.get(l)
        if c is None:
            continue
        bucket = _top_bits(np.uint32(h), C1, c.b_bits)
        g = _top_bits(np.uint32(h ^ c.salt), C2, c.s_bits)
        s = (g + int(c.disp[bucket])) & ((1 << c.s_bits) - 1)
        r, c0 = divmod(s, c.spr)
        c0 *= c.cols
        slot = c.rows[r, c0:c0 + c.cols]
        idx1 = int(slot[l]) | (int(slot[l + 1]) << 8) | \
            (int(slot[l + 2]) << 16)
        if idx1 != 0 and bytes(slot[:l]) == data[p:p + l]:
            best_idx, best_len = idx1 - 1, l + tables.lil_off
        for k, i in zip(c.ovf_keys or (), c.ovf_idx or ()):
            if data[p:p + l] == k:
                best_idx, best_len = i, l + tables.lil_off
    return best_idx, best_len
