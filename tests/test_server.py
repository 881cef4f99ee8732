"""Wire-protocol server tests (protocol of tokenmonsterserver.go)."""

import struct

import numpy as np
import pytest

from tokenmonster_tpu.core.vocab import Vocab
from tokenmonster_tpu.server import VERSION, TokenMonsterServer


def make_vocab(tmp_path):
    v = Vocab.new(tokens=[b"hello", b" hello", b"world", b" world"],
                  special_tokens=[b"<s>"], charset=1, normalization="none",
                  using_capcode=2, include_ascii_bytes=True)
    p = tmp_path / "s.vocab"
    v.save(p)
    return v, p


def u64(v):
    return struct.pack("<Q", v)


def u32(v):
    return struct.pack("<I", v)


def batch1(payload: bytes) -> bytes:
    return u32(1) + u64(len(payload)) + payload


def test_server_roundtrip(tmp_path):
    core, path = make_vocab(tmp_path)
    s = TokenMonsterServer()

    # version
    resp = s.handle(0, 0, b"")
    assert resp[0] == 1 and struct.unpack_from("<I", resp, 1)[0] == VERSION

    # load
    fname = str(path).encode()
    resp = s.handle(10, 0, bytes([len(fname)]) + fname)
    assert resp[0] == 1
    vid = struct.unpack_from("<I", resp, 1)[0]

    # tokenize "hello world"
    resp = s.handle(1, vid, batch1(b"hello world"))
    assert resp[0] == 0
    n_batches = struct.unpack_from("<I", resp, 9)[0]
    assert n_batches == 1
    blen = struct.unpack_from("<Q", resp, 13)[0]
    ser = resp[21:21 + blen]
    ids = np.frombuffer(ser, "<u2")

    # count matches
    resp = s.handle(20, vid, batch1(b"hello world"))
    count = struct.unpack_from("<Q", resp, 13)[0]
    assert count == len(ids)

    # decode round trip
    resp = s.handle(2, vid, batch1(ser))
    blen = struct.unpack_from("<Q", resp, 13)[0]
    text = resp[21:21 + blen]
    assert text == b"hello world"

    # streaming decoder
    resp = s.handle(5, vid, b"")
    did = struct.unpack_from("<I", resp, 1)[0]
    out = b""
    for tid in ids:
        resp = s.handle(7, did, struct.pack("<H", tid))
        ln = struct.unpack_from("<Q", resp, 1)[0]
        out += resp[9:9 + ln]
    assert out == b"hello world"
    assert s.handle(6, did, b"")[0] == 2

    # token listing
    resp = s.handle(15, vid, b"")
    n = struct.unpack_from("<I", resp, 9)[0]
    assert n == len(core)

    # modify: add a token, resize 0
    payload = bytes([0, 0]) + u32(1) + bytes([3]) + b"zzz" + u32(0) + u32(0) + u32(0)
    resp = s.handle(14, vid, payload)
    assert resp[0] == 3
    new_size = struct.unpack_from("<I", resp, 1)[0]
    assert new_size == len(core) + 1

    # export + reimport YAML
    resp = s.handle(19, vid, bytes([0]))
    ln = struct.unpack_from("<Q", resp, 1)[0]
    yml = resp[9:9 + ln]
    resp = s.handle(18, 0, yml)
    assert resp[0] == 0
    vals = struct.unpack_from("<IIII", resp, 9 + 4)
    assert vals[0] == new_size

    # save to file
    out_path = str(tmp_path / "resaved.vocab").encode()
    resp = s.handle(12, vid, bytes([len(out_path)]) + out_path)
    assert resp[0] == 2
    v2 = Vocab.load(tmp_path / "resaved.vocab")
    assert len(v2) == new_size

    # unload; then errors
    assert s.handle(11, vid, b"")[0] == 2
    assert s.handle(1, vid, batch1(b"x"))[0] == 11
    assert s.handle(1, 99, batch1(b"x"))[0] == 10
