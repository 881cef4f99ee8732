"""Golden conformance fixtures: FNV-1a checksums of token-id streams.

Mirrors the reference's checksum-emitting bench style
(tokenmonster-cpp/tests/bench.cpp:39-54): deterministic corpora, fixed
vocabularies, exact id-stream checksums. These lock the tokenizer semantics
across refactors/rounds — any change to the score formula, alternatives,
capcode, normalization or dictionary ordering shows up here.

Regenerate (only after intentionally changing semantics):
    python tests/test_golden.py --regen
"""

import json
import os

import numpy as np
import pytest

from tokenmonster_tpu.core.tokenizer import tokenize as host_tokenize
from tokenmonster_tpu.core.vocab import Vocab, normalize_and_capcode

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_checksums.json")

CORPUS = (
    b"The quick brown fox jumps over the lazy dog. HELLO World! 123 "
    b"int main() { return 0; } // C\n#define X 42\n"
    b"O'Brien's CamelCaseIdentifier snake_case SCREAMING ABCdef "
    + "Ünïcödé — “quotes” 你好 🎉 ".encode("utf-8")
    + bytes(range(256))
) * 3

TOKENS = [b" the", b"the", b" quick", b" brown", b" fox", b" jump", b"jumps",
          b" over", b" lazy", b" dog", b"ing", b"er", b" hello", b"hello",
          b" world", b"s ", b"e ", b"  ", b"\n", b" int", b" main",
          b"() {", b" return", b"; }", b"//", b"#define", b" 42", b" 12",
          b"3 ", b"'s", b" o'", b"brien", b" camel", b"case", b" snake",
          b"_case", b" screaming", b"abc", b"def", b" ab", b"cd", b"ef"]


def _fnv(ids) -> int:
    h = 14695981039346656037
    mask = (1 << 64) - 1
    for v in np.asarray(ids, np.uint32).tobytes():
        h = ((h ^ v) * 1099511628211) & mask
    return h


def _configs():
    out = {}
    for capcode in (0, 1, 2):
        for norm in ("none", "nfd"):
            v = Vocab()
            v._generate(tokens=TOKENS, charset=1, normalize_string=norm,
                        using_capcode=capcode, level=5, reserve=8,
                        reset_token_ids=True)
            out[f"small-cap{capcode}-{norm}"] = v
    return out


def _compute():
    result = {}
    for name, v in _configs().items():
        data = normalize_and_capcode(CORPUS, v.using_capcode, v.normalizer)
        ids, missing = host_tokenize(v, data)
        result[name] = {
            "n_tokens": int(len(ids)),
            "missing": int(missing),
            "fnv": str(_fnv(ids)),
            "vocab_size": v.vocab_size,
        }
    return result


def test_golden_checksums():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing — run --regen")
    with open(GOLDEN) as f:
        want = json.load(f)
    got = _compute()
    assert got == want, (
        "Tokenizer semantics changed! If intentional, regenerate the golden "
        "file with: python tests/test_golden.py --regen")


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        with open(GOLDEN, "w") as f:
            json.dump(_compute(), f, indent=1, sort_keys=True)
        print(f"wrote {GOLDEN}")
