"""Native capcode encoders must be byte-exact vs the Python reference
ports (the Python loops are the spec; the native path is the default)."""

import numpy as np
import pytest

from tokenmonster_tpu import native
from tokenmonster_tpu.core import capcode as cc

SAMPLES = [
    b"",
    b"Hello World",
    b"HELLO world HTML XMLHttpRequest iPhone O'Neill d'Arc",
    b"The QUICK brown FoX. ABCdef  A1B2 C3 99Luftballons",
    "Ünïcödé ÇAPS ÉTÉ STRASSE gross".encode(),
    b"mixedCASE miXEd CAPS2 2CAPS A",
    b"  double  spaces   and\ttabs\nlines\r\n",
    b"code_id = someVar + OTHER_CONST * 3; // COMMENT",
    "日本語 ALLCAPS ΕΛΛΗΝΙΚΑ ΚΕΦΑΛΑΙΑ mixed".encode(),
    b"A" * 200 + b" " + b"WORD " * 50,
]


@pytest.fixture(autouse=True)
def _need_native():
    if native.get_lib() is None:
        pytest.skip("native library unavailable")


def _python_encode(data):
    """Call the pure-Python body by bypassing the native fast path."""
    import unittest.mock as mock
    with mock.patch.object(native, "native_capcode_encode",
                           lambda d: None):
        return cc.encode(data)


def _python_nocapcode(data):
    import unittest.mock as mock
    with mock.patch.object(native, "native_nocapcode_encode",
                           lambda d: None):
        return cc.no_capcode_encode(data)


def test_capcode_encode_native_parity():
    for s in SAMPLES:
        assert cc.encode(s) == _python_encode(s), s


def test_nocapcode_encode_native_parity():
    for s in SAMPLES:
        assert cc.no_capcode_encode(s) == _python_nocapcode(s), s


def test_real_corpus_slice_parity():
    import os
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("corpus_r5_train.bin", "real_corpus.bin"):
        path = os.path.join(here, ".tmp", name)
        if os.path.exists(path):
            break
    else:
        pytest.skip("no corpus (tools/measure/build_real_corpus.py)")
    data = open(path, "rb").read(1 << 20)
    assert cc.encode(data) == _python_encode(data)
