"""End-to-end training pipeline: getalltokens -> trainvocab -> exportvocab."""

import os

import numpy as np
import pytest

from tokenmonster_tpu.core.vocab import Vocab, normalize_and_capcode
from tokenmonster_tpu.train.getalltokens import (
    get_all_tokens, load_tokens_file, save_tokens_file,
)
from tokenmonster_tpu.train.trainvocab import TrainConfig, train_vocab
from tokenmonster_tpu.train.exportvocab import export_vocab

CORPUS = (
    b"The quick brown fox jumps over the lazy dog. The dog sleeps while the "
    b"fox runs through the forest. Every morning the sun rises over the "
    b"mountains and the birds sing their songs. People walk through the "
    b"streets of the city, talking about the weather and the news. "
    b"Children play in the park while their parents watch from the benches. "
) * 64


def test_getalltokens_modes(tmp_path):
    for mode in ("unfiltered", "clean", "balanced", "consistent", "strict"):
        counter, char_table, header = get_all_tokens(
            CORPUS, mode, charset=1, normalization="nfd", using_capcode=2,
            min_occur_total=8, chunk_size=1 << 20, micro_chunks=1,
            add_extra_tokens=False)
        assert len(counter) > 20, mode
        toks = counter.keys_sorted()
        assert all(2 <= len(t) <= 40 for t in toks)
        if mode == "strict":
            # strict mode: " word" tokens only contain letters/space/apos
            for t in toks:
                if t.startswith(b" t"):
                    assert all(c == 0x20 or chr(c).isalpha() or c in (0x27,)
                               for c in t), t
        path = tmp_path / f"{mode}.tok"
        save_tokens_file(path, counter, char_table, header)
        d = load_tokens_file(path)
        got = [t for t in d["tokens"] if len(t) > 1]
        assert got == toks
        assert d["using_capcode"] == 2 and d["level"] in range(5)


def test_filters_match_expected_shapes():
    from tokenmonster_tpu.train import filters as F
    ctx = F.Ctx(1, 2)
    # strict rejects mixed word+punct
    _, ok = F.filter_strict(ctx, b" hello!x")
    assert not ok
    t, ok = F.filter_strict(ctx, b" hellox")
    assert ok and t == b" hello"
    # numbers only tokens (lookahead rune is not checked in this branch)
    t, ok = F.filter_strict(ctx, b" 123x")
    assert ok and t == b" 123"
    t, ok = F.filter_strict(ctx, b" 12a4")
    assert not ok
    # clean rejects double spaces with letters
    _, ok = F.filter_clean(ctx, b"a  b c")
    assert not ok


@pytest.mark.slow
def test_train_end_to_end(tmp_path):
    corpus = b""
    for f in ("README.md", "training/README.md", "benchmark/pretrain.md"):
        with open("/root/reference/" + f, "rb") as fh:
            corpus += fh.read() + b"\n"
    corpus *= 2

    counter, char_table, header = get_all_tokens(
        corpus, "balanced", charset=1, normalization="nfd", using_capcode=2,
        min_occur_total=12, min_occur_singles=1, chunk_size=1 << 22,
        micro_chunks=1, add_extra_tokens=False)
    tok_path = tmp_path / "all.tok"
    save_tokens_file(tok_path, counter, char_table, header)

    results = tmp_path / "results"
    cfg = TrainConfig(vocab_size=400, workers=3, fast=True, seed=42,
                      keep_trying=15, backend="native")
    best = train_vocab(corpus, tok_path, results, cfg)
    assert best is not None and os.path.exists(best)

    vocab_path = tmp_path / "out.vocab"
    v = export_vocab(input_path=str(results), output=str(vocab_path))
    assert abs(len(v) - 400) <= 2

    # The trained vocabulary round-trips the corpus and compresses it.
    # (tokenize normalizes internally; decode returns the NFD-normalized text)
    ids, missing = v.tokenize(corpus)
    assert missing == 0
    assert v.decode(ids) == v.normalizer.normalize(corpus)
    chars_per_token = len(corpus) / len(ids)
    assert chars_per_token > 2.2, chars_per_token

    v2 = Vocab.load(vocab_path)
    ids2, _ = v2.tokenize(corpus)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_output_tokens_roundtrip(tmp_path):
    """exportvocab -output-tokens: vocabulary -> trainvocab-usable .tok
    (exportvocab.go:364-384) whose reload carries the same token set,
    scores for every entry, specials, and the vocab's header bytes."""
    from tokenmonster_tpu.core.vocab import Vocab
    from tokenmonster_tpu.train.exportvocab import save_vocab_as_tokens
    from tokenmonster_tpu.train.getalltokens import load_tokens_file

    v = Vocab()
    v._generate(
        tokens=[b" the", b"the", b" quick", b"fox", b"jumps", b"ing",
                b"er", b" hello", b"world", b"s ", b"\n"],
        special_tokens=[b"<eos>"],
        charset=1, normalize_string="none", using_capcode=2,
        level=3, reset_token_ids=True)
    path = tmp_path / "back.tok"
    n = save_vocab_as_tokens(v, path)
    d = load_tokens_file(path)
    assert len(d["tokens"]) == n
    got = set(d["tokens"])
    want = {i["token"] for i in v.tokens_detailed() if i["token"]}
    assert got == want
    assert d["scores"] is not None and len(d["scores"]) == n
    # specials round-trip in their stored (normalized+capcoded) form —
    # the reference writes TokensDetailed token bytes verbatim and
    # re-imports them as encoded specials
    assert d["specials"] == [i["token"] for i in v.tokens_detailed()
                             if i["type"] == 2]
    assert len(d["specials"]) == 1
    assert (d["using_capcode"], d["charset"], d["norm_flag"], d["level"],
            d["reserve"]) == (v.using_capcode, v.charset,
                              v.normalizer.flag, v.level, v.reserve)
