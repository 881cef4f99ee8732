"""AOT executable cache round-trip: warm_aot must compile+serialize on a
single-device backend, a second tokenizer must LOAD (no recompile) and
produce identical results; on the multi-device CPU test mesh it must
decline cleanly (serialized executables bind to the device set).  The
on-hardware cache hit is certified by bench.py's aot_hit/t_warm_ms."""

import numpy as np

from tokenmonster_tpu.core.vocab import Vocab


def _vocab():
    v = Vocab()
    v._generate(tokens=[b" the", b"the", b" fox", b"fox", b"jumps",
                        b" jumps", b"e", b"t", b" ", b"o", b"x", b"h",
                        b"u", b"m", b"p", b"s", b"j", b"f"],
                charset=1, normalize_string="none", using_capcode=0,
                level=5, reset_token_ids=True)
    return v


def test_warm_aot_roundtrip(tmp_path):
    from tokenmonster_tpu.ops.scan import TpuTokenizer
    data = b"the fox jumps over the fox " * 400
    v = _vocab()
    tk1 = TpuTokenizer(v, chunk=2048)
    staged1 = tk1.stage(data)
    ok = tk1.warm_aot(staged1, str(tmp_path))
    r1 = tk1.tokenize_staged(staged1)
    assert r1 is not None
    import os
    entries = os.listdir(tmp_path)
    if not ok:
        # serialization unavailable on this backend — nothing cached
        return
    assert entries, "warm_aot reported ok but cached nothing"

    tk2 = TpuTokenizer(v, chunk=2048)
    staged2 = tk2.stage(data)
    assert tk2.warm_aot(staged2, str(tmp_path)), "cache load failed"
    r2 = tk2.tokenize_staged(staged2)
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
    assert r1[1] == r2[1]
