"""Worker for the multi-process (multi-host emulation) bit-exactness test.

Launched by tests/test_multihost.py as N separate processes, each with
4 virtual CPU devices.  Computes the distributed trainer scoring step over
the (hosts, data) mesh and writes the psum'd result (process 0 only).

Usage: python multihost_worker.py <pid> <nproc> <port> <workdir>
"""
import os
import sys

pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tokenmonster_tpu.parallel import multihost  # noqa: E402


def main():
    multihost.init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    import jax
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4

    from tokenmonster_tpu.core.vocab import Vocab
    from tokenmonster_tpu.parallel.score import device_tables_for_scoring

    vocab = Vocab.load(os.path.join(workdir, "test.vocab"))
    corpus = open(os.path.join(workdir, "corpus.bin"), "rb").read()

    mesh = multihost.make_multihost_mesh()
    chunk = 512
    dv, tables = device_tables_for_scoring(vocab)
    step = multihost.make_multihost_score_step(
        mesh, chunk, dv.has_delete and dv.space_dfa is not None,
        dv.delete_token & 0xFFFFFF, int(dv.ids[:, 0].max()) + 1)
    text = multihost.shard_text_for_process(
        np.frombuffer(corpus, np.uint8), mesh, chunk)
    scores, n_tok, n_miss = step(text, *tables)
    if pid == 0:
        np.savez(os.path.join(workdir, "out_multi.npz"),
                 scores=np.asarray(scores), n_tok=int(n_tok),
                 n_miss=int(n_miss))
    print(f"worker {pid} done", flush=True)


main()
