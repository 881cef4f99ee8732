"""Native AC DFA builder vs pure-Python oracle: identical tables."""

import numpy as np
import pytest

from tokenmonster_tpu import native
from tokenmonster_tpu.ops.automaton import MatchAutomaton

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="no C++ toolchain")


def _python_build(keys, indices, lengths=None):
    """Invoke the pure-Python path by bypassing the native short-circuit."""
    import tokenmonster_tpu.ops.automaton as am

    class _NoNative:
        @staticmethod
        def native_ac_build(*a, **k):
            return None
    import tokenmonster_tpu
    orig = tokenmonster_tpu.native.native_ac_build
    tokenmonster_tpu.native.native_ac_build = _NoNative.native_ac_build
    try:
        return am.MatchAutomaton.build(keys, indices, lengths)
    finally:
        tokenmonster_tpu.native.native_ac_build = orig


def test_ac_build_parity():
    rng = np.random.default_rng(5)
    words = [b"the", b"he", b"hello", b" hel", b"lo", b"o w", b"world",
             b"a", b"\x00", b"\xff\xfe", b"ing", b"--", b"D t", b" t"]
    keys = sorted(set(words), key=lambda t: (len(t), t))
    idx = list(range(len(keys)))
    a = MatchAutomaton.build(keys, idx)
    b = _python_build(keys, idx)
    assert a.n_states == b.n_states
    np.testing.assert_array_equal(a.dfa, b.dfa)
    np.testing.assert_array_equal(a.out, b.out)

    # custom lengths (space-automaton style)
    lens = [min(40, len(k) + 1) for k in keys]
    a2 = MatchAutomaton.build(keys, idx, lens)
    b2 = _python_build(keys, idx, lens)
    np.testing.assert_array_equal(a2.dfa, b2.dfa)
    np.testing.assert_array_equal(a2.out, b2.out)


def test_ac_build_parity_larger():
    rng = np.random.default_rng(9)
    keys = set()
    while len(keys) < 400:
        ln = int(rng.integers(1, 12))
        keys.add(bytes(rng.integers(97, 105, size=ln).tolist()))
    keys = sorted(keys, key=lambda t: (len(t), t))
    idx = list(range(len(keys)))
    a = MatchAutomaton.build(keys, idx)
    b = _python_build(keys, idx)
    assert a.n_states == b.n_states
    np.testing.assert_array_equal(a.dfa, b.dfa)
    np.testing.assert_array_equal(a.out, b.out)
