"""End-to-end Pallas engine (TpuTokenizer engine='auto' -> 'pallas'):
match kernel + decision kernel + follow kernel + stitch, interpret-mode on
CPU, byte-exact vs the host oracle."""

import numpy as np
import pytest

from tokenmonster_tpu.core.tokenizer import tokenize as host_tokenize
from tokenmonster_tpu.core.vocab import Vocab


@pytest.fixture(scope="module")
def plain_vocab():
    v = Vocab()
    v._generate(
        tokens=[b" the", b"the", b" quick", b"quick", b" brown", b" fox",
                b"he", b"er", b"e", b"t", b" ", b"o", b"x", b" jumps",
                b" over", b" lazy", b" dog", b"s", b"ing", b"\n", b".",
                b"q", b"u", b"i", b"c", b"k", b"b", b"r", b"w", b"n"],
        charset=1, normalize_string="none", using_capcode=0,
        level=5, reserve=8, reset_token_ids=True)
    return v


def test_engine_selection(plain_vocab):
    from tokenmonster_tpu.ops.scan import TpuTokenizer
    tk = TpuTokenizer(plain_vocab, chunk=512)
    assert tk.engine == "pallas"


def test_pallas_engine_small_lanes(plain_vocab):
    """XLA follow branch (lane count < 512)."""
    from tokenmonster_tpu.ops.scan import TpuTokenizer
    tk = TpuTokenizer(plain_vocab, chunk=512)
    data = (b"the quick brown fox jumps over the lazy dog. " * 150)
    ids, miss = tk.tokenize(data)
    want, wmiss = host_tokenize(plain_vocab, data)
    np.testing.assert_array_equal(ids, np.asarray(want))
    assert miss == wmiss


def test_pallas_engine_follow_kernel(plain_vocab):
    """Pallas follow branch (512 lanes) incl. unmatched bytes."""
    from tokenmonster_tpu.ops.scan import TpuTokenizer
    tk = TpuTokenizer(plain_vocab, chunk=32)
    base = (b"the quick brown fox jumps over the lazy dog. " * 400)
    data = base[:8000] + bytes([1, 2, 3]) * 25 + base[8000:512 * 32 - 200]
    ids, miss = tk.tokenize(data)
    want, wmiss = host_tokenize(plain_vocab, data)
    np.testing.assert_array_equal(ids, np.asarray(want))
    assert miss == wmiss


def test_delete_vocab_selects_pallas():
    """Capcode-2 vocabularies (delete token) now take the fast device path:
    the space-stripped hash tables + both forward-delete decision rows."""
    from tokenmonster_tpu.ops.scan import TpuTokenizer
    from test_scan_parity import capcode_vocab
    v = capcode_vocab.__wrapped__()
    tk = TpuTokenizer(v, chunk=512)
    assert tk.engine == "pallas"


def test_capcode_vocab_pallas_parity():
    """Delete-token vocabulary through the full Pallas pipeline, byte-exact
    incl. delete-token emissions (go/tokenmonster.go:1088-1108)."""
    from tokenmonster_tpu.core.vocab import normalize_and_capcode
    from tokenmonster_tpu.ops.scan import TpuTokenizer
    from test_scan_parity import ENGLISH, capcode_vocab
    v = capcode_vocab.__wrapped__()
    data = normalize_and_capcode(ENGLISH * 2, 2, v.normalizer)
    want, wmiss = host_tokenize(v, data)
    # the case must actually exercise the forward-delete branch
    assert int((np.asarray(want) == v.delete_token).sum()) > 0
    for chunk in (512,):
        tk = TpuTokenizer(v, chunk=chunk)
        assert tk.engine == "pallas"
        ids, miss = tk.tokenize(data)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(want))
        assert miss == wmiss


def test_capcode_vocab_pallas_follow_kernel():
    """Delete-token vocabulary on the two-row Pallas follow kernel
    (lane count a multiple of 128) with binary bytes (miss path)."""
    import random

    from tokenmonster_tpu.core.vocab import normalize_and_capcode
    from tokenmonster_tpu.ops.scan import TpuTokenizer
    from test_scan_parity import ENGLISH, capcode_vocab
    v = capcode_vocab.__wrapped__()
    base = normalize_and_capcode(ENGLISH * 12, 2, v.normalizer)
    data = (base[:2000] + bytes([1, 2, 3]) * 20
            + base[2000:32 * 128 - 60])
    want, wmiss = host_tokenize(v, data)
    tk = TpuTokenizer(v, chunk=32)
    assert tk.engine == "pallas"
    ids, miss = tk.tokenize(data)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want))
    assert miss == wmiss


def test_utf16_delete_vocab_pallas_parity():
    """UTF-16 charset (lilbufOffset=2, go/tokenmonster.go:1031-1036) with a
    delete token through the Pallas engine, incl. delete emissions."""
    import random

    from tokenmonster_tpu.core.vocab import Vocab
    from tokenmonster_tpu.ops.scan import TpuTokenizer

    def u16(s):
        return s.encode("utf-16-le")

    toks = [u16(t) for t in ["jump", " jump", "ser", " ser", "er", " er",
                             "s", "ing", " box", "boxing", " vow", " jumps",
                             " judge", "judgeing", " inger", " serve",
                             "rve", " in", "ge", " ge", "box", "vow",
                             " vowing"]]
    singles = [u16(c) for c in "abcdefghijklmnopqrstuvwxyz ."]
    v = Vocab()
    v._generate(tokens=toks + singles + [b"\x7f"], charset=2,
                normalize_string="none", using_capcode=1, level=5,
                reset_token_ids=True)
    assert v.delete_token != 0xFFFFFF
    rnd = random.Random(5)
    words = ["jump", "ser", "er", "s", "ing", "box", "vow", "judge", "ge",
             "in", "rve", "serve", "inger"]
    parts = []
    for _ in range(80):
        parts.append(rnd.choice(words))
        if rnd.random() < 0.5:
            parts.append(" ")
    data = u16("".join(parts)) * 6
    want, wmiss = host_tokenize(v, data)
    assert int((np.asarray(want) == v.delete_token).sum()) > 0
    tk = TpuTokenizer(v, chunk=256)
    assert tk.engine == "pallas"
    ids, miss = tk.tokenize(data)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want))
    assert miss == wmiss


def test_record_window_overflow_falls_back(plain_vocab):
    """Streams denser than the stitch record window (~1 byte/token) must
    fail sync_ok and take the exact host-stitch fallback."""
    from tokenmonster_tpu.ops.scan import TpuTokenizer
    tk = TpuTokenizer(plain_vocab, chunk=2048)
    # single letters separated by unmatched bytes -> ~1 record per 1-2 bytes
    data = (b"q\x01u\x02i\x03c\x04k\x05" * 800)[:3000]
    ids, miss = tk.tokenize(data)
    want, wmiss = host_tokenize(plain_vocab, data)
    np.testing.assert_array_equal(ids, np.asarray(want))
    assert miss == wmiss
