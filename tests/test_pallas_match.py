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
