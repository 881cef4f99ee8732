"""Crash-resume from trainer checkpoints (trainvocab.go:1609-1642).

The reference's main crash-safety feature: the trainer periodically writes
``interval_*/doublevocab_*/finalrun_*`` checkpoints; restarting with the
results directory as the dictionary input resumes from the newest one
(finalrun before doublevocab before interval), because every intermediate
``.tok`` is a valid training dictionary (training/README.md:248).
"""

import os

import numpy as np
import pytest

from tokenmonster_tpu.train.getalltokens import get_all_tokens, save_tokens_file
from tokenmonster_tpu.train.trainvocab import TrainConfig, train_vocab
from tokenmonster_tpu.train.exportvocab import export_vocab

CORPUS = (
    b"The quick brown fox jumps over the lazy dog while the dog sleeps. "
    b"Every morning the sun rises over the hills and the birds sing songs. "
    b"People walk along the streets talking about the weather and the news. "
) * 48


@pytest.mark.slow
def test_resume_from_checkpoint(tmp_path):
    counter, char_table, header = get_all_tokens(
        CORPUS, "balanced", charset=1, normalization="nfd", using_capcode=2,
        min_occur_total=3, min_occur_singles=1, chunk_size=1 << 22,
        micro_chunks=1, add_extra_tokens=False)
    tok_path = tmp_path / "all.tok"
    save_tokens_file(tok_path, counter, char_table, header)
    assert len(counter) > 600  # enough rounds above target for an interval

    # Phase 1: run until an interval checkpoint exists, then "crash" (the
    # max_rounds knob stops the master loop mid-training).
    results = tmp_path / "results"
    cfg = TrainConfig(vocab_size=200, workers=2, fast=True, seed=7,
                      keep_trying=15, backend="native", max_rounds=13)
    train_vocab(CORPUS, tok_path, results, cfg)
    ckpts = [f for f in os.listdir(results)
             if f.startswith(("interval_", "doublevocab_", "finalrun_"))]
    assert ckpts, "no checkpoint written before the crash"

    # Phase 2: resume by passing the results directory as the dictionary.
    cfg2 = TrainConfig(vocab_size=200, workers=2, fast=True, seed=7,
                       keep_trying=15, backend="native")
    best = train_vocab(CORPUS, str(results), results, cfg2)
    assert best is not None and os.path.exists(best)

    v = export_vocab(input_path=str(results), output=str(tmp_path / "o.vocab"))
    assert abs(len(v) - 200) <= 2
    ids, missing = v.tokenize(CORPUS)
    assert missing == 0
    assert v.decode(ids) == v.normalizer.normalize(CORPUS)
