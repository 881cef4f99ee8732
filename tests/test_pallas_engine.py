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


def test_delete_vocab_keeps_decision_engine():
    """Capcode-2 vocabularies (delete token) stay on the XLA engine."""
    from tokenmonster_tpu.ops.scan import TpuTokenizer
    from test_scan_parity import capcode_vocab
    v = capcode_vocab.__wrapped__()
    tk = TpuTokenizer(v, chunk=512)
    assert tk.engine == "decision"


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
