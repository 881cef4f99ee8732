"""Prebuilt-vocabulary registry resolution fixtures (VERDICT r4 missing
#6): name validation, local-directory resolution, the download URL shape,
and clean offline failure — no network required."""

import os
import shutil

import pytest

from tokenmonster_tpu import api


@pytest.mark.parametrize("name,ok", [
    ("english-32000-balanced-v1", True),
    ("englishcode-32000-consistent-v1", True),
    ("code-4096-strict-v1", True),
    ("fiction-100256-unfiltered-v1", True),
    ("english-32000-balanced-nocapcode-v1", True),
    ("gpt2", True),
    ("llama", True),
    ("english-32000-balanced", False),        # missing version
    ("english-31999-balanced-v1", False),     # unknown size
    ("klingon-32000-balanced-v1", False),     # unknown dataset
    ("english-32000-sloppy-v1", False),       # unknown mode
    ("english-32000-balanced-capcode-v1", False),
    ("", False),
])
def test_is_prebuilt_names(name, ok):
    assert api.is_prebuilt(name) is ok


def test_resolve_prefers_local_directory(tmp_path, monkeypatch):
    src = ".tmp/gpt2_bench.vocab"
    if not os.path.exists(src):
        pytest.skip("bench vocab not cached")
    monkeypatch.setenv("TM_VOCAB_DIR", str(tmp_path))
    shutil.copy(src, tmp_path / "english-32000-balanced-v1.vocab")
    got = api.Vocab._resolve("english-32000-balanced-v1")
    assert got == str(tmp_path / "english-32000-balanced-v1.vocab")


def test_resolve_offline_failure_names_url_and_target(tmp_path,
                                                      monkeypatch):
    monkeypatch.setenv("TM_VOCAB_DIR", str(tmp_path))

    # block network deterministically (the rig has no egress anyway)
    import urllib.request

    def _no_net(*a, **k):
        raise OSError("no network")

    monkeypatch.setattr(urllib.request, "urlopen", _no_net)
    with pytest.raises(FileNotFoundError) as e:
        api.Vocab._resolve("english-32000-balanced-v1")
    msg = str(e.value)
    assert ("huggingface.co/alasdairforsythe/tokenmonster/resolve/main/"
            "vocabs/english-32000-balanced-v1.vocab") in msg
    assert str(tmp_path) in msg


def test_resolve_unknown_name_fails_fast():
    with pytest.raises(FileNotFoundError):
        api.Vocab._resolve("definitely-not-a-vocab")
