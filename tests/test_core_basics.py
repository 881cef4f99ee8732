"""Core conformance tests.

test_minimal_vocab_file is a port of the reference C++ unit test
(tokenmonster-cpp/tests/unit.cpp): a 4-token vocabulary synthesized byte by
byte, with hand-computed expected token ids.
"""

import os
import struct
import tempfile

import numpy as np
import pytest

import tokenmonster_tpu as tm
from tokenmonster_tpu.core import capcode as cc
from tokenmonster_tpu.core.normalize import Normalizer, parse_flags
from tokenmonster_tpu.core.vocab import Vocab

DNE = 0xFFFFFF


def u24(v):
    return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))


def make_minimal_vocab_bytes():
    out = bytearray()
    out += bytes([0, 0, 0, 5, 0, 0, 0, 0])  # header
    out += u24(DNE)      # unk
    out += u24(4)        # vocab size
    out += u24(4)        # reverse entries
    out += u24(4)        # info entries
    out += u24(DNE)      # delete token
    out += bytes([2])    # max token length
    for token, tid in ((b" ", 0), (b"a", 1), (b"b", 2), (b"ab", 3)):
        out += bytes([len(token)]) + token
        out += bytes([0, 0])             # flag, nWords
        out += u24(DNE) + u24(DNE) + u24(tid)
        out += struct.pack("<f", 1.0)
    out += bytes(256)    # beginByte
    out += u24(0)        # deleted
    return bytes(out)


@pytest.fixture
def minimal_vocab(tmp_path):
    path = tmp_path / "minimal.vocab"
    path.write_bytes(make_minimal_vocab_bytes())
    return Vocab.load(path)


def test_minimal_vocab_file(minimal_vocab, tmp_path):
    vocab = minimal_vocab
    assert vocab.vocab_size == 4
    assert vocab.max_token_length == 2

    ids, missing = vocab.tokenize(b"ab a z")
    assert ids.tolist() == [3, 0, 1, 0]
    assert missing == 1

    decoded = vocab.decode(ids)
    assert decoded == b"ab a "

    ser, enc_len, _missing = vocab.tokenize_to_serialized(b"ab", 2)
    assert enc_len == 2
    assert ser == bytes([3, 0])
    assert vocab.deserialize(ser, 2).tolist() == [3]

    tid, found = vocab.token_to_id(b"ab")
    assert found and tid == 3
    assert vocab.id_to_token(3) == b"ab"

    n, missing = vocab.count(b"ab a z")
    assert n == 4 and missing == 1

    dec = vocab.new_decoder()
    assert dec.decode(np.array([3, 0, 1], np.uint32)) == b"ab a"
    assert dec.decode_serialized(bytes([0, 0]), 2) == b" "
    assert dec.flush() == b""

    # Round trip through save/load preserves everything byte-exactly.
    p2 = tmp_path / "roundtrip.vocab"
    vocab.save(p2)
    assert p2.read_bytes() == make_minimal_vocab_bytes()


def test_capcode_roundtrip():
    samples = [
        "Hello World",
        "HELLO WORLD",
        "hello world",
        "MixedCase and ALLCAPS plus lower",
        "It's John's book, and JOHN'S HOUSE",
        "numbers 123 then ABC123 mixed A1B2",
        "  spaces  and\ttabs\nand\r\nlines ",
        "CamelCaseIdentifier and snake_case and SCREAMING_SNAKE",
        "Ünïcödé ÀÉÎÕÜ mixed with ÑOÑO",
        "a.b,c;D:E!F?G",
        "trailing upper ABC",
        "A",
        "",
        "I",
        "iPhone XS Max",
        "McDonald's and O'Brien's",
        "HTML5 and CSS3 and ES2015",
    ]
    for s in samples:
        data = s.encode("utf-8")
        encoded = cc.encode(data)
        decoded = cc.decode(encoded)
        assert decoded == data, f"capcode roundtrip failed for {s!r}: {encoded!r} -> {decoded!r}"


def test_capcode_known_forms():
    # Single-capital word: the W marker is rewritten to C when the word
    # turns out not to be all-caps.
    assert cc.encode(b" Apple") == b"C apple"
    # All-caps word keeps W.
    assert cc.encode(b" APPLE ") == b"W apple "
    # Text-initial lowercase gets a "D " prefix (rlast starts as '.').
    assert cc.encode(b"hello") == b"D hello"
    # Mid-word uppercase inserts D + marker.
    assert cc.encode(b"xApple") == b"D xDC apple"
    # All-caps run ending in lowercase triggers the retroactive fixups.
    assert cc.decode(cc.encode(b"ABCdef")) == b"ABCdef"


def test_capcode_streaming_state():
    data = "The QUICK Brown FoX".encode()
    encoded = cc.encode(data)
    # Decode in every possible split position: state must carry across chunks.
    for cut in range(len(encoded) + 1):
        d = cc.Decoder()
        out = d.decode(encoded[:cut]) + d.decode(encoded[cut:])
        assert out == data, f"cut={cut}"


def test_no_capcode_roundtrip():
    for s in ["foo-bar baz", "a1b2", "hello (world)", "x=y+z",
              "tab\tsep", "ünïcödé-wörds"]:
        data = s.encode("utf-8")
        enc = cc.no_capcode_encode(data)
        assert cc.no_capcode_decode(enc) == data


def test_normalizer():
    n = Normalizer("unixlines collapse")
    assert n.normalize(b"a\r\nb") == b"a\nb"
    assert n.normalize(b"a  b   c") == b"a b c"
    n2 = Normalizer("quotemarks")
    assert n2.normalize("“quoted” and ‘single’".encode()) == b'"quoted" and \'single\''
    n3 = Normalizer("trim leadingspace")
    assert n3.normalize(b"  hi  ") == b" hi"
    n4 = Normalizer("lowercase")
    assert n4.normalize("HeLLo ÀÉ".encode()) == "hello àé".encode()
    n5 = Normalizer("nfd")
    assert n5.normalize("é".encode()) == b"e\xcc\x81"
    n6 = Normalizer("accents")
    assert n6.normalize("éàü".encode()) == b"eau"
    assert parse_flags("nfd lowercase") == 3
    assert str(Normalizer("nfd")) == "nfd"


def test_new_vocab_builder():
    vocab = Vocab.new(
        tokens=[b"hello", b" hello", b"world", b" world", b" hello world",
                b"the", b" the", b"ing", b"tion"],
        special_tokens=[b"<eos>"],
        charset=1, normalization="none", using_capcode=2,
        include_ascii_bytes=True)
    # 75 ASCII singles (capcode 2 drops A-Z except C/W/D) + 9 tokens + 1 special
    assert vocab.vocab_size == 85
    text = b"hello world the Thing"
    ids, missing = vocab.tokenize(text)
    assert missing == 0
    assert vocab.decode(ids) == text
    # special token must be found (stored in normalized+capcoded form)
    tid, found = vocab.token_to_id(vocab.normalize(b"<eos>"))
    assert found
    info = vocab.tokens_detailed()
    specials = [i for i in info if i["type"] == 2]
    assert len(specials) == 1 and specials[0]["token_decoded"] == b"<eos>"


def test_vocab_save_load_identity(tmp_path):
    vocab = Vocab.new(
        tokens=[b"alpha", b" alpha", b"beta", b" beta", b"gamma"],
        special_tokens=[b"<pad>"], charset=1, normalization="nfd",
        using_capcode=2, include_ascii_bytes=True)
    p = tmp_path / "v.vocab"
    vocab.save(p)
    v2 = Vocab.load(p)
    p2 = tmp_path / "v2.vocab"
    v2.save(p2)
    assert p.read_bytes() == p2.read_bytes()
    text = b"alpha beta gamma delta"
    assert vocab.tokenize(text)[0].tolist() == v2.tokenize(text)[0].tolist()


def test_delete_token_forward_delete_path():
    # With capcode, a "D " + token duplicate must allow mid-word matches.
    # Pass pre-encoded tokens so "hello" stays a bare-word token.
    vocab = Vocab()
    vocab._generate(tokens=[b" hello", b" world", b"hello"],
                    charset=1, normalize_string="none", using_capcode=2,
                    level=5, reserve=8, reset_token_ids=True)
    idx, found = vocab.dictionary.find(b"D hello")
    assert found
    # duplicate has the same ID as the primary (bare-word) token
    tid, found2 = vocab.token_to_id(b"hello")
    assert found2
    assert int(vocab.id[idx]) == tid
    # duplicate is hidden from the token list and has sentinel score -1
    assert b"D hello" not in vocab.token_list()
    assert vocab.score[idx] < -0.5


def test_api_mirror(tmp_path):
    core = Vocab.new(
        tokens=[b"hello", b" hello", b"world", b" world"],
        special_tokens=[], charset=1, normalization="none",
        using_capcode=2, include_ascii_bytes=True)
    p = tmp_path / "api.vocab"
    core.save(p)
    vocab = tm.load(str(p))
    ids = vocab.tokenize("hello world")
    assert isinstance(ids, np.ndarray)
    assert vocab.decode(ids) == "hello world"
    assert vocab.decode([int(i) for i in ids]) == "hello world"
    assert vocab.tokenize_count("hello world") == len(ids)
    assert vocab.charset() == "UTF-8"
    assert vocab.capcode() == 2
    d = vocab.decoder()
    text = "".join(d.decode([int(i)]) for i in ids)
    assert text == "hello world"


def test_yaml_roundtrip():
    core = Vocab.new(
        tokens=[b"hello", b" hello", b"world"],
        special_tokens=[b"<s>"], charset=1, normalization="none",
        using_capcode=0, include_ascii_bytes=True)
    yml = core.export_yaml()
    v2 = Vocab.from_yaml(yml)
    assert sorted(core.token_list()) == sorted(v2.token_list())
    text = b"hello world"
    assert core.tokenize(text)[0].tolist() == v2.tokenize(text)[0].tolist()
    # ids preserved
    for t in (b"hello", b" hello", b"world", b"<s>"):
        assert core.token_to_id(t) == v2.token_to_id(t)


def test_unk_token():
    core = Vocab.new(tokens=[b"ab"], special_tokens=[], charset=1,
                     normalization="none", using_capcode=0,
                     include_ascii_bytes=True)
    assert not core.has_unk()
    assert core.enable_unk_token()
    assert core.has_unk()
    ids, missing = core.tokenize(b"ab\xc3\xa9")  # é has no token
    assert missing == 2
    assert (np.asarray(ids) == core.unk_token).sum() == 2
