"""api.Vocab routes large inputs through the TPU runtime (VERDICT r1 #7):
forced device-backend tokenize must equal the native/host path exactly."""

import os

import numpy as np
import pytest

from tokenmonster_tpu import api
from tokenmonster_tpu.core.vocab import Vocab as _CoreVocab


@pytest.fixture()
def vocab(tmp_path):
    v = _CoreVocab()
    v._generate(tokens=[b" the", b"the", b" quick", b" brown", b" fox",
                        b" jump", b"jumps", b" over", b" lazy", b" dog",
                        b"ing", b"er", b" hello", b"hello", b" world",
                        b"s ", b"e ", b"  ", b"\n", b"a", b"o", b"t", b" "],
                charset=1, normalize_string="none", using_capcode=2,
                level=5, reserve=8, reset_token_ids=True)
    p = tmp_path / "t.vocab"
    v.save(p)
    return api.Vocab(str(p))


def test_tpu_route_parity(vocab, monkeypatch):
    text = ("The quick brown fox jumps over the lazy dog. Hello world! "
            * 40)
    monkeypatch.setenv("TM_API_BACKEND", "tpu")
    monkeypatch.setattr(api.Vocab, "TPU_THRESHOLD", 256)
    want = vocab._tokenize_one(text[:64])  # native path (below threshold)
    got_full = vocab.tokenize(text)
    assert vocab._tpu, "TPU tokenizer should have been built (forced)"
    # host/native reference on the full text with threshold disabled
    monkeypatch.setattr(api.Vocab, "TPU_THRESHOLD", 1 << 40)
    ref_full = vocab.tokenize(text)
    np.testing.assert_array_equal(np.asarray(got_full),
                                  np.asarray(ref_full))
    assert want.dtype == got_full.dtype


def test_measured_rate_routing_excludes_compile_and_reprobes():
    """The route probe must not count one-time compilation (it would lock
    the TPU path out), and the losing path must be re-probed periodically
    (round-4 review findings)."""
    import tokenmonster_tpu as tm

    v = tm.load(".tmp/gpt2_bench.vocab") if __import__("os").path.exists(
        ".tmp/gpt2_bench.vocab") else None
    if v is None:
        import pytest
        pytest.skip("bench vocab not cached")
    # drive _pick_route directly with synthetic rates
    v._route_rates = {"native": None, "tpu": None}
    v._route_calls = 0
    assert v._pick_route() == "tpu"          # unprobed -> probe tpu first
    v._route_rates["tpu"] = 5e6
    assert v._pick_route() == "native"       # then probe native
    v._route_rates["native"] = 40e6
    for _ in range(v._REPROBE_EVERY - 3):
        assert v._pick_route() == "native"   # native wins steady-state
    # the reprobe tick clears the loser and routes it once
    routes = [v._pick_route() for _ in range(4)]
    assert "tpu" in routes, routes
    # warm tracking: no chain geometry is warm yet, so the first tpu call
    # for any input size is never timed
    assert v._tpu_warm_geoms == set()
