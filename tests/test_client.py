"""Subprocess client <-> stdio server round trip over real pipes."""

import numpy as np
import pytest

import tokenmonster_tpu as tm
from tokenmonster_tpu.core.vocab import Vocab


@pytest.mark.slow
def test_multiprocess_safe_load(tmp_path):
    core = Vocab.new(tokens=[b"hello", b" hello", b"world", b" world"],
                     special_tokens=[], charset=1, normalization="none",
                     using_capcode=2, include_ascii_bytes=True)
    p = tmp_path / "c.vocab"
    core.save(p)

    remote = tm.load_multiprocess_safe(str(p))
    try:
        assert len(remote) == len(core)
        ids = remote.tokenize("hello world")
        local = tm.load(str(p))
        np.testing.assert_array_equal(ids, local.tokenize("hello world"))
        assert remote.decode(ids) == "hello world"
        remote.unload()
    finally:
        remote._server.close()
