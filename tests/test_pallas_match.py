"""Pallas longest-match kernel (ops/pallas_match.py) + its hash tables
(ops/hashmatch.py): CPU interpret-mode parity vs the dictionary oracle."""

import numpy as np
import pytest

import jax

from tokenmonster_tpu.ops.hashmatch import build_hashmatch, host_longest_match
from tokenmonster_tpu.ops.pallas_match import make_match_kernel, reference_match

from test_scan_parity import ENGLISH, capcode_vocab  # noqa: F401


def _dict_oracle(vocab, data):
    out = np.zeros(len(data), np.uint32)
    ls = vocab.dictionary.longest_substring
    for p in range(len(data)):
        idx, length, found = ls(data, p, min(len(data) - p,
                                             vocab.max_token_length))
        if found:
            out[p] = (idx << 6) | length
    return out


def test_tables_match_dictionary(capcode_vocab):  # noqa: F811
    tables = build_hashmatch(capcode_vocab.tokens)
    data = bytes(ENGLISH * 2)
    want = _dict_oracle(capcode_vocab, data)
    got = reference_match(tables, data)
    np.testing.assert_array_equal(got, want)


def test_tables_random_bytes(capcode_vocab):  # noqa: F811
    tables = build_hashmatch(capcode_vocab.tokens)
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 1500).astype(np.uint8).tobytes()
    want = _dict_oracle(capcode_vocab, data)
    got = reference_match(tables, data)
    np.testing.assert_array_equal(got, want)


def test_kernel_interpret_parity(capcode_vocab):  # noqa: F811
    tables = build_hashmatch(capcode_vocab.tokens)
    fn = make_match_kernel(tables, interpret=True)
    data = bytes(ENGLISH * 3)
    n = len(data)
    total = -(-(n + 192) // 1024) * 1024
    pad = np.zeros(total, np.uint8)
    pad[:n] = np.frombuffer(data, np.uint8)
    got = np.asarray(fn(jax.numpy.asarray(pad), n))
    want = np.zeros(total, np.uint32)
    want[:n] = _dict_oracle(capcode_vocab, data)
    np.testing.assert_array_equal(got, want)


def test_kernel_interpret_random(capcode_vocab):  # noqa: F811
    tables = build_hashmatch(capcode_vocab.tokens)
    fn = make_match_kernel(tables, interpret=True)
    rng = np.random.default_rng(9)
    total = 2048
    pad = rng.integers(0, 256, total).astype(np.uint8)
    n = 1900
    got = np.asarray(fn(jax.numpy.asarray(pad), n))
    want = np.zeros(total, np.uint32)
    want[:n] = _dict_oracle(capcode_vocab, bytes(pad[:n]))
    np.testing.assert_array_equal(got, want)


def test_full_hash_collision_overflow():
    """Keys whose full 32-bit poly hash collides (e.g. the real pair
    b'D ncate' / b'D recti' found in the round-4 training pool) cannot be
    CHD-displaced apart — they must route to direct-compare overflow
    probes and still match exactly."""
    import jax
    import numpy as np

    from tokenmonster_tpu.ops.hashmatch import (build_hashmatch,
                                                host_longest_match,
                                                poly_hash)
    from tokenmonster_tpu.ops.pallas_match import TILE_ROWS, make_match_kernel
    assert int(poly_hash(b"D ncate")) == int(poly_hash(b"D recti"))
    keys = [b" the", b"the", b"D ncate", b"D recti", b" ", b"a", b"e",
            b"ncate", b"recti", b"D r"]
    tabs = build_hashmatch(keys, space_prefix=b" ")
    assert sum(len(c.ovf_keys or ()) for c in tabs.classes) == 1
    fn = make_match_kernel(tabs, interpret=True)
    data = b"the D ncateD recti a theD r ncate recti" * 3
    buf = np.zeros(128 * TILE_ROWS, np.uint8)
    buf[:len(data)] = np.frombuffer(data, np.uint8)
    m, _mb = fn(jax.numpy.asarray(buf), len(data))
    m = np.asarray(m)

    def brute(p):
        best = (0, 0)
        for i, k in enumerate(keys):
            if data[p:p + len(k)] == k and len(k) > best[1]:
                best = (i, len(k))
        return best

    for p in range(len(data)):
        i, l = brute(p)
        want = 0 if l == 0 else (i << 6) | l
        assert m[p] == want, p
        hi, hl = host_longest_match(tabs, data, p)
        hwant = 0 if hl == 0 else (hi << 6) | hl
        assert m[p] == hwant, p


def test_kernel_partitioned_parity(capcode_vocab):  # noqa: F811
    """A tiny VMEM cap forces multi-part probing (the big-pool trainer
    path): disjoint length-class parts merged by match length must equal
    the single-part kernel exactly."""
    tables = build_hashmatch(capcode_vocab.tokens, space_prefix=b" ")
    fn1 = make_match_kernel(tables, interpret=True)
    fnp = make_match_kernel(tables, interpret=True, vmem_cap_bytes=1)
    data = bytes(ENGLISH * 3)
    n = len(data)
    total = -(-(n + 192) // 2048) * 2048
    pad = np.zeros(total, np.uint8)
    pad[:n] = np.frombuffer(data, np.uint8)
    import jax.numpy as jnp
    a_m, a_mb = fn1(jnp.asarray(pad), n)
    b_m, b_mb = fnp(jnp.asarray(pad), n)
    np.testing.assert_array_equal(np.asarray(a_m), np.asarray(b_m))
    np.testing.assert_array_equal(np.asarray(a_mb), np.asarray(b_mb))
