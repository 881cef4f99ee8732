"""Aux subsystems: importers, dataset helpers, serialization, YAML escapes."""

import numpy as np
import pytest

from tokenmonster_tpu.core.tokenizer import deserialize_tokens, serialize_tokens
from tokenmonster_tpu.core.vocab import Vocab


def test_serialize_24bit_roundtrip():
    ids = np.array([0, 1, 65535, 65536, 16777214], np.uint32)
    for enc in (2, 3, 4):
        ser = serialize_tokens(ids if enc > 2 else ids[:3], enc)
        got = deserialize_tokens(ser, enc)
        np.testing.assert_array_equal(got, ids if enc > 2 else ids[:3])


def test_sentencepiece_import():
    from tokenmonster_tpu.train.imports import import_sentencepiece_tokens
    toks = ["<unk>", "▁the", "▁quick", "▁brown", "fox", "qu", "ick", "the",
            "▁", "t", "h", "e", "q", "u", "i", "c", "k", "b", "r", "o", "w",
            "n", "f", "x", " "]
    v = import_sentencepiece_tokens([t.encode() for t in toks])
    tid, found = v.token_to_id(b" the")
    assert found and tid == toks.index("▁the")
    ids, missing = v.tokenize(b"the quick brown fox")
    assert missing == 0
    assert v.decode(ids) == b"the quick brown fox"


def test_only_valid_latin():
    from tokenmonster_tpu.train.dataset_helpers import only_valid_latin
    latin = b"The quick brown fox. " * 20
    mixed = latin + "Κείμενο στα ελληνικά ".encode() * 20 + latin
    out = only_valid_latin(mixed, min_run=50)
    assert b"quick" in out
    assert "ελλην".encode() not in out


def test_extract_text_jsonl(tmp_path):
    from tokenmonster_tpu.train.dataset_helpers import extract_text
    p = tmp_path / "a.jsonl"
    p.write_text('{"text": "hello"}\n{"text": "world"}\n{"other": 1}\n')
    out = tmp_path / "corpus.txt"
    n = extract_text([p], out)
    assert n == 2
    assert out.read_bytes() == b"hello\nworld\n"


def test_yaml_hex_escape_roundtrip():
    v = Vocab.new(tokens=[b"\xff\xfe", b"plain", b'quo"te', b"tab\there"],
                  special_tokens=[], charset=1, normalization="none",
                  using_capcode=0, include_ascii_bytes=True)
    yml = v.export_yaml()
    assert b"TokenMonsterHexEncode{fffe}" in yml
    v2 = Vocab.from_yaml(yml)
    assert sorted(v.token_list()) == sorted(v2.token_list())


def test_vocab_resize_and_resurrect():
    v = Vocab.new(tokens=[b"alpha", b"beta", b"gamma", b"delta"],
                  special_tokens=[], charset=1, normalization="none",
                  using_capcode=0, include_ascii_bytes=True)
    # scores are needed for resize; set via yaml modify
    yml = b"tokens:\n"
    for i, t in enumerate([b"alpha", b"beta", b"gamma", b"delta"]):
        yml += b'  - token: "%s"\n    score: %d.5\n    encoded: true\n' % (t, i + 1)
    v.modify_from_yaml(yml)
    base = len(v)
    v.resize(base - 2)
    assert len(v) == base - 2
    assert v.num_deleted_tokens() >= 2
    # lowest-scoring multi-byte tokens went first
    assert v.token_to_id(b"alpha")[1] is False
    assert v.token_to_id(b"delta")[1] is True
    v.resize(base)
    assert len(v) == base
    assert v.token_to_id(b"alpha")[1] is True


def test_prebuilt_name_registry(tmp_path, monkeypatch):
    """Published vocab names resolve against the local vocab dir; name
    validation matches the reference (python/tokenmonster.py:1178-1202)."""
    import shutil
    import tokenmonster_tpu as tm
    assert tm.api.is_prebuilt("englishcode-32000-consistent-v1")
    assert tm.api.is_prebuilt("english-1024-clean-nocapcode-v2")
    assert tm.api.is_prebuilt("gpt2")
    assert tm.api.is_prebuilt("llama")
    assert not tm.api.is_prebuilt("english-999-clean-v1")
    assert not tm.api.is_prebuilt("english-1024-clean-nocapcode-x2")
    assert not tm.api.is_prebuilt("fiction-1024-clean")

    import os
    src = os.path.join(os.path.dirname(__file__), "..", ".tmp",
                       "gpt2_bench.vocab")
    if not os.path.exists(src):
        import pytest
        pytest.skip("bench vocab cache not built")
    shutil.copy(src, tmp_path / "english-1024-clean-v1.vocab")
    monkeypatch.setenv("TM_VOCAB_DIR", str(tmp_path))
    v = tm.load("english-1024-clean-v1")
    assert v.vocab_size > 0

    import pytest
    with pytest.raises(FileNotFoundError, match="not a local file"):
        tm.load("no-such-thing")
    with pytest.raises(FileNotFoundError, match="not cached"):
        tm.load("fiction-2048-balanced-v9")
