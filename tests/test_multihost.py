"""Multi-host (multi-process) distributed scoring: N-process == 1-process.

Launches 2 separate OS processes, each with 4 virtual CPU devices, connected
via jax.distributed (gRPC coordinator).  The psum'd per-token score vector
over the (hosts, data) mesh must equal the single-process (1x8 mesh) result
bit-exactly: integer reduction over an identical strip layout.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from test_scan_parity import ENGLISH
    from tokenmonster_tpu.core.vocab import Vocab, normalize_and_capcode

    d = tmp_path_factory.mktemp("multihost")
    v = Vocab()
    v._generate(
        tokens=[b" the", b"the", b" quick", b"quick", b" brown", b" fox",
                b" jump", b"jumps", b" over", b" lazy", b" dog", b"ing",
                b" box", b" liquor", b" five", b" judge", b" my", b" vow",
                b"er", b" ju", b"mp", b"s ", b"e ", b"d ", b"  ", b"\n",
                b" return", b" int", b" main", b" printf", b" def", b" x"],
        charset=1, normalize_string="none", using_capcode=2,
        level=5, reserve=8, reset_token_ids=True)
    v.save(str(d / "test.vocab"))
    data = normalize_and_capcode(ENGLISH * 40, 2, v.normalizer)
    (d / "corpus.bin").write_bytes(bytes(data))
    return d


def test_two_process_scores_bitexact(workdir):
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base.pop("XLA_FLAGS", None)

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port), str(workdir)],
            env=env_base, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker failed:\n{so.decode()[-2000:]}\n{se.decode()[-2000:]}")

    multi = np.load(os.path.join(workdir, "out_multi.npz"))

    # single-process reference on a 1x8 virtual mesh (same global layout)
    from jax.sharding import Mesh
    import jax

    from tokenmonster_tpu.core.vocab import Vocab
    from tokenmonster_tpu.parallel.multihost import (
        DATA_AXIS, HOST_AXIS, make_multihost_score_step)
    from tokenmonster_tpu.parallel.score import device_tables_for_scoring

    vocab = Vocab.load(os.path.join(workdir, "test.vocab"))
    corpus = open(os.path.join(workdir, "corpus.bin"), "rb").read()

    chunk = 512
    devices = np.asarray(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devices, (HOST_AXIS, DATA_AXIS))
    dv, tables = device_tables_for_scoring(vocab)
    step = make_multihost_score_step(
        mesh, chunk, dv.has_delete and dv.space_dfa is not None,
        dv.delete_token & 0xFFFFFF, int(dv.ids[:, 0].max()) + 1)

    arr = np.frombuffer(corpus, np.uint8)
    n_dev = 8
    per = -(-len(arr) // n_dev)
    per = -(-per // chunk) * chunk
    buf = np.zeros(per * n_dev, np.uint8)
    buf[:len(arr)] = arr
    scores, n_tok, n_miss = step(buf, *tables)

    assert int(n_tok) == int(multi["n_tok"])
    assert int(n_miss) == int(multi["n_miss"])
    np.testing.assert_array_equal(np.asarray(scores), multi["scores"])
