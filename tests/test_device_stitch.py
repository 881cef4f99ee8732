"""Device-side stitch/compaction (ops/stitch.py) vs host oracle and the
legacy host stitcher — including multi-dispatch bridge chaining."""

import numpy as np
import pytest

from tokenmonster_tpu.core.tokenizer import tokenize as host_tokenize
from tokenmonster_tpu.core.vocab import Vocab, normalize_and_capcode
from tokenmonster_tpu.ops import scan as scan_mod
from tokenmonster_tpu.ops.scan import TpuTokenizer

ENGLISH = (
    b"The quick brown fox jumps over the lazy dog. Pack my box with five "
    b"dozen liquor jugs. How vexingly quick daft zebras jump! "
    b"def f(x):\n    return x * 2  # python\n"
)


@pytest.fixture(scope="module")
def vocab():
    v = Vocab()
    v._generate(
        tokens=[b" hello", b" world", b"hello", b"hell", b"he", b" he",
                b" the", b"the", b" quick", b"quick", b" brown", b" fox",
                b" jump", b"jumps", b" over", b" lazy", b" dog", b"ing",
                b" box", b" liquor", b" five", b"er", b" ju", b"mp",
                b"s ", b"e ", b"d ", b" return", b"return", b" x",
                b" def", b" f(x):", b"    ", b" * 2", b" #", b" python",
                b"  ", b"\n"],
        charset=1, normalize_string="none", using_capcode=2,
        level=5, reserve=8, reset_token_ids=True)
    return v


def test_multidispatch_bridge_chaining(vocab, monkeypatch):
    """Force many chained dispatches (small MAX_LANES) and check exact
    parity: the bridge-lane skip scalar must flow correctly between
    dispatches."""
    monkeypatch.setattr(scan_mod, "MAX_LANES", 8)
    data = normalize_and_capcode(ENGLISH * 40, 2, vocab.normalizer)
    want_ids, want_missing = host_tokenize(vocab, data)
    tk = TpuTokenizer(vocab, chunk=64, engine="decision")
    L, plan = tk._plan(len(data))
    assert len(plan) > 3, "test should exercise multiple dispatches"
    got = tk.tokenize_staged(tk.stage(data))
    assert got is not None, "device stitch unexpectedly failed to sync"
    ids, missing = got
    assert missing == want_missing
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))


def test_device_matches_hoststitch(vocab):
    """Device-stitched ids == legacy host-stitched ids == oracle."""
    data = normalize_and_capcode(ENGLISH * 6, 2, vocab.normalizer)
    tk = TpuTokenizer(vocab, chunk=128, engine="decision")
    dev = tk.tokenize_staged(tk.stage(data))
    host = tk._tokenize_hoststitch(data)
    want = host_tokenize(vocab, data)
    assert dev is not None
    np.testing.assert_array_equal(np.asarray(dev[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(host[0]), np.asarray(want[0]))
    assert dev[1] == want[1] == host[1]


def test_missing_bytes_and_unk(vocab):
    """Binary junk (missing bytes) flows through the device stitch."""
    rng = np.random.default_rng(3)
    data = (ENGLISH + rng.integers(128, 256, 400, dtype=np.uint8).tobytes()
            + ENGLISH)
    want_ids, want_missing = host_tokenize(vocab, data)
    tk = TpuTokenizer(vocab, chunk=64, engine="decision")
    ids, missing = tk.tokenize(data)
    assert missing == want_missing
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))


def test_tiny_and_empty(vocab):
    tk = TpuTokenizer(vocab, chunk=64, engine="decision")
    ids, missing = tk.tokenize(b"")
    assert len(ids) == 0 and missing == 0
    data = b" hello"
    want_ids, want_missing = host_tokenize(vocab, data)
    ids, missing = tk.tokenize(data)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(want_ids))
    assert missing == want_missing
