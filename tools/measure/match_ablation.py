#!/usr/bin/env python
"""Match-kernel ablation ladder on hardware (gpt2-50k tables, 4 MB).

Times the standalone Pallas match kernel with pieces ablated to locate
the cost (ablations change semantics — perf probes only):
  full       — the real kernel
  one_field  — fetch only field plane 0 per class (probe fetch cost cut
               to ~1/nf): isolates the plane-fetch share
  no_disp    — skip the displacement fetch
  no_probe   — skip all table fetches/compares: leaves the per-length
               rolling hash, NAF bucket/slot mixes and window builds
  no_probe+no_disp — same minus displacement planes
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_vocab, SEED_TEXT, MB
from tokenmonster_tpu.ops.hashmatch import build_hashmatch
from tokenmonster_tpu.ops.pallas_match import TILE_ROWS, make_match_kernel

N_MB = 4
corpus = (SEED_TEXT * (N_MB * MB // len(SEED_TEXT) + 1))[:N_MB * MB]
vocab = build_vocab()
tabs = build_hashmatch(vocab.tokens, space_prefix=None)

grain = 128 * TILE_ROWS
n = len(corpus)
N = -(-(n + 128) // grain) * grain
text = np.zeros(N, np.uint8)
text[:n] = np.frombuffer(corpus, np.uint8)
text_d = jnp.asarray(text)

for name, abl in [("full", frozenset()),
                  ("one_field", frozenset({"one_field"})),
                  ("no_disp", frozenset({"no_disp"})),
                  ("no_probe", frozenset({"no_probe"})),
                  ("no_probe+no_disp", frozenset({"no_probe", "no_disp"}))]:
    fn = make_match_kernel(tabs, ablate=abl)
    t0 = time.time()
    m = fn(text_d, n)
    _ = int(np.asarray(m[:1])[0])
    t_compile = time.time() - t0
    # steady state: throwaway loop then timed loop (DESIGN methodology)
    for _ in range(3):
        m = fn(text_d, n)
    _ = int(np.asarray(m[:1])[0])
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        m = fn(text_d, n)
    _ = int(np.asarray(m[:1])[0])
    dt = (time.time() - t0) / reps
    print(f"{name:18s} {dt * 1000 / N_MB:6.2f} ms/MB "
          f"({N_MB / dt:6.1f} MB/s)   [compile {t_compile:.1f} s]",
          flush=True)
print("DONE", flush=True)
