"""Measure axon-tunnel overlap properties for the e2e pipeline design.

Q1: does a device->host fetch of an ALREADY-COMPUTED buffer overlap with
    queued (not yet finished) device compute, or serialize behind it?
Q2: do two back-to-back fetches pipeline (copy_to_host_async), or pay
    2 full RTT+bw each?
Q3: does a host->device upload overlap queued compute?
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_vocab, SEED_TEXT, MB, CORPUS_MB
from tokenmonster_tpu.ops.scan import TpuTokenizer

corpus = (SEED_TEXT * (CORPUS_MB * MB // len(SEED_TEXT) + 1))[:CORPUS_MB * MB]
vocab = build_vocab()
tk = TpuTokenizer(vocab, chunk=2048)
staged = tk.stage(corpus)
ok = tk.warm_aot(staged, "/root/repo/.tmp/aotcache")
print("aot_hit:", ok, flush=True)
res = tk.tokenize_staged(staged)
assert res is not None
print("warm done, tokens:", len(res[0]), flush=True)

# a big precomputed buffer to fetch (u16, ~2.6MB)
big = jax.jit(lambda: jnp.arange(1323706, dtype=jnp.uint16))()
big.block_until_ready()
_ = np.asarray(big)  # warm the fetch path

# steady-state: measure plain fetch bw
for rep in range(3):
    t0 = time.time()
    _ = np.asarray(big)
    print(f"fetch 2.6MB alone: {(time.time()-t0)*1000:.1f} ms", flush=True)

# small scalar fetch RTT
small = jax.jit(lambda: jnp.zeros((8, 128), jnp.int32))()
_ = np.asarray(small)
t0 = time.time(); _ = np.asarray(small)
print(f"fetch small: {(time.time()-t0)*1000:.1f} ms", flush=True)

# measure compute time of the chain (steady state)
for _ in range(2):
    outs = tk._run_staged(staged)
_ = [int(o[1]) for o in outs]
t0 = time.time()
for _ in range(5):
    outs = tk._run_staged(staged)
_ = [int(o[1]) for o in outs]
c_ms = (time.time() - t0) / 5 * 1000
print(f"chain compute: {c_ms:.1f} ms", flush=True)

# Q1: enqueue 10 chains (~10*c_ms of compute), then fetch `big`
for rep in range(3):
    t0 = time.time()
    for _ in range(10):
        outs = tk._run_staged(staged)
    t_enq = time.time() - t0
    t0 = time.time()
    _ = np.asarray(big)
    t_fetch = time.time() - t0
    t0 = time.time()
    _ = [int(o[1]) for o in outs]
    t_drain = time.time() - t0
    print(f"Q1 rep{rep}: enqueue {t_enq*1000:.1f} ms, fetch-during-compute "
          f"{t_fetch*1000:.1f} ms, drain {t_drain*1000:.1f} ms", flush=True)

# Q2: two async fetches pipelined vs serial
big2 = jax.jit(lambda: jnp.arange(1323706, dtype=jnp.uint16) + 1)()
big2.block_until_ready(); _ = np.asarray(big2)
t0 = time.time(); a = np.asarray(big); b = np.asarray(big2)
print(f"Q2 serial 2 fetches: {(time.time()-t0)*1000:.1f} ms", flush=True)
try:
    t0 = time.time()
    big.copy_to_host_async(); big2.copy_to_host_async()
    a = np.asarray(big); b = np.asarray(big2)
    print(f"Q2 async 2 fetches: {(time.time()-t0)*1000:.1f} ms", flush=True)
except Exception as e:
    print("Q2 async unavailable:", e, flush=True)

# Q3: upload 4MB while compute queued
up = np.frombuffer(corpus, np.uint8).copy()
t0 = time.time(); d = jnp.asarray(up); d.block_until_ready()
print(f"Q3 upload 4MB alone: {(time.time()-t0)*1000:.1f} ms", flush=True)
for _ in range(10):
    outs = tk._run_staged(staged)
t0 = time.time(); d2 = jnp.asarray(up + 1); d2.block_until_ready()
print(f"Q3 upload 4MB during compute: {(time.time()-t0)*1000:.1f} ms",
      flush=True)
_ = [int(o[1]) for o in outs]
print("DONE", flush=True)
