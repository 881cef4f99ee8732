"""Device suffix sort (ops/device_sort) must produce the same counting
results as the host sort: tie order may differ, but run structure — and
therefore the candidate pool and its counts — must be identical."""

import os

import numpy as np
import pytest


def test_device_sorted_windows_runs_match_host():
    from tokenmonster_tpu.native import native_sorted_windows
    from tokenmonster_tpu.ops.device_sort import device_sorted_windows
    rng = np.random.default_rng(5)
    text = (b"the cat sat on the mat and the cat ate the rat. " * 300
            + bytes(rng.integers(0, 256, 2000).astype(np.uint8)))
    data = np.frombuffer(text, np.uint8)
    width = 41
    n = len(data) - width - 1
    dev = device_sorted_windows(data, n, width)
    assert dev is not None
    host = native_sorted_windows(data, n, width)
    if host is None:
        pytest.skip("native library unavailable")
    od, fdd = dev
    oh, fdh = host
    # same multiset of positions
    assert sorted(od) == sorted(oh)
    win = np.lib.stride_tricks.sliding_window_view(
        np.concatenate([data, np.zeros(width + 8, np.uint8)]), width)
    # identical sorted window BYTES (ties reorder positions, not content)
    np.testing.assert_array_equal(win[od], win[oh])
    # identical run structure at every length
    for l in (2, 3, 5, 8, 13, 21, 40):
        np.testing.assert_array_equal(
            np.minimum(fdd, l) < l, np.minimum(fdh, l) < l)


def test_get_all_tokens_device_equals_host():
    from tokenmonster_tpu.train.getalltokens import get_all_tokens
    text = (b"Some REAL text with CaPiTaLs, code_id = 3; and the usual "
            b"suspects: the quick brown fox jumps over the lazy dog. "
            * 120)
    kw = dict(charset=1, normalization="nfd", using_capcode=2,
              min_occur_total=3, prefilter_min_raw=2)
    os.environ["TM_GAT_DEVICE"] = "1"
    try:
        c_dev, ct_dev, _h = get_all_tokens(text, "balanced", **kw)
    finally:
        os.environ.pop("TM_GAT_DEVICE", None)
    c_host, ct_host, _h = get_all_tokens(text, "balanced", **kw)
    np.testing.assert_array_equal(ct_dev, ct_host)
    toks_d = {bytes(t) for t in c_dev.keys_sorted()}
    toks_h = {bytes(t) for t in c_host.keys_sorted()}
    assert toks_d == toks_h
