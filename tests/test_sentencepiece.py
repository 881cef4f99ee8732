"""Offline sentencepiece tokenizer.model importer (convert_llamatokenizer.py).

Synthesizes a real ModelProto protobuf byte stream (the same wire format a
LLaMa tokenizer.model uses) and checks the importer reproduces the reference
conversion semantics: '▁'->space, <0xNN> byte pieces, unk/control handling,
leading-space normalization.
"""

import struct

import numpy as np

from tokenmonster_tpu.train.imports import (
    SP_BYTE, SP_CONTROL, SP_NORMAL, SP_UNKNOWN,
    import_sentencepiece_model, read_sentencepiece_model)


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _piece(piece: str, score: float, ptype: int) -> bytes:
    body = (b"\x0a" + _varint(len(piece.encode())) + piece.encode()
            + b"\x15" + struct.pack("<f", score)
            + b"\x18" + _varint(ptype))
    return b"\x0a" + _varint(len(body)) + body


def _write_model(path, pieces):
    blob = b"".join(_piece(p, s, t) for p, s, t in pieces)
    # append a TrainerSpec-ish unknown field (field 2, len-delim) that the
    # reader must skip
    blob += b"\x12\x03abc"
    with open(path, "wb") as f:
        f.write(blob)


PIECES = [
    ("<unk>", 0.0, SP_UNKNOWN),
    ("<s>", 0.0, SP_CONTROL),
    ("</s>", 0.0, SP_CONTROL),
    ("<0x41>", -1.0, SP_BYTE),       # 'A'
    ("▁the", -2.0, SP_NORMAL),
    ("▁quick", -3.0, SP_NORMAL),
    ("▁fox", -3.5, SP_NORMAL),
    ("qu", -4.0, SP_NORMAL),
    ("ick", -4.5, SP_NORMAL),
    ("th", -5.0, SP_NORMAL),
    ("e", -6.0, SP_NORMAL),
    ("t", -6.2, SP_NORMAL),
    ("h", -6.3, SP_NORMAL),
    ("i", -6.4, SP_NORMAL),
    ("c", -6.5, SP_NORMAL),
    ("k", -6.6, SP_NORMAL),
    ("▁", -6.7, SP_NORMAL),
]


def test_read_model(tmp_path):
    path = tmp_path / "tokenizer.model"
    _write_model(path, PIECES)
    got = read_sentencepiece_model(path)
    assert [g[0] for g in got] == [p[0] for p in PIECES]
    assert got[4][2] == SP_NORMAL and got[0][2] == SP_UNKNOWN
    assert abs(got[5][1] - (-3.0)) < 1e-6


def test_import_model(tmp_path):
    path = tmp_path / "tokenizer.model"
    _write_model(path, PIECES)
    v = import_sentencepiece_model(path)

    # unk and specials preserved at their sentencepiece ids
    assert v.unk_token == 0
    assert v.token_to_id(b"<s>") == (1, True)
    assert v.token_to_id(b"</s>") == (2, True)
    # byte piece decodes to the raw byte, '▁' to a space
    assert v.token_to_id(b"A") == (3, True)
    assert v.token_to_id(b" the") == (4, True)

    # leading-space normalization (reference YAML header) + exact ids
    from tokenmonster_tpu.core.tokenizer import tokenize
    from tokenmonster_tpu.core.vocab import normalize_and_capcode
    data = normalize_and_capcode(b"the quick", v.using_capcode, v.normalizer)
    assert data == b" the quick"  # LeadingSpace normalization applied
    ids, missing = tokenize(v, data)
    assert missing == 0
    assert [int(i) for i in ids] == [4, 5]

    # round-trip through the decoder restores the normalized text
    from tokenmonster_tpu.core.decoder import StreamDecoder
    out = StreamDecoder(v).decode(np.asarray(ids, np.uint32))
    assert bytes(out) == b" the quick"
