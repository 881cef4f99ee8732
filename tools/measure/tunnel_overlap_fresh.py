"""Tunnel fetch measurements with FRESH arrays (jax caches host copies:
re-fetching the same jax.Array is free, so round-1 numbers were invalid).
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
print("aot:", tk.warm_aot(staged, "/root/repo/.tmp/aotcache"), flush=True)
res = tk.tokenize_staged(staged)
print("tokens:", len(res[0]), flush=True)

N = 1323706
mk = jax.jit(lambda s: (jnp.arange(N, dtype=jnp.uint32) + s)
             .astype(jnp.uint16))
_ = np.asarray(mk(jnp.uint32(0)))  # compile + warm

# fresh-array fetch bandwidth (2.6MB u16)
for rep in range(1, 4):
    a = mk(jnp.uint32(rep)); a.block_until_ready()
    t0 = time.time(); _ = np.asarray(a)
    print(f"fetch fresh 2.6MB: {(time.time()-t0)*1000:.1f} ms", flush=True)

# fresh small fetch (RTT)
mks = jax.jit(lambda s: jnp.zeros((8, 128), jnp.int32) + s)
_ = np.asarray(mks(0))
for rep in range(1, 3):
    a = mks(rep); a.block_until_ready()
    t0 = time.time(); _ = np.asarray(a)
    print(f"fetch fresh small: {(time.time()-t0)*1000:.1f} ms", flush=True)

# Q1 redo: fetch fresh computed buffer while 10 chains queued
for rep in range(3):
    a = mk(jnp.uint32(100 + rep)); a.block_until_ready()
    t0 = time.time()
    for _ in range(10):
        outs = tk._run_staged(staged)
    t_enq = time.time() - t0
    t0 = time.time(); _ = np.asarray(a)
    t_fetch = time.time() - t0
    t0 = time.time(); _ = [int(o[1]) for o in outs]
    t_drain = time.time() - t0
    print(f"Q1 rep{rep}: enq {t_enq*1000:.1f}, fetch-during "
          f"{t_fetch*1000:.1f}, drain {t_drain*1000:.1f} ms", flush=True)

# Q2 redo: two fresh fetches, serial vs async-then-read
a = mk(jnp.uint32(201)); b = mk(jnp.uint32(202))
a.block_until_ready(); b.block_until_ready()
t0 = time.time(); _ = np.asarray(a); _ = np.asarray(b)
print(f"Q2 serial: {(time.time()-t0)*1000:.1f} ms", flush=True)
a = mk(jnp.uint32(203)); b = mk(jnp.uint32(204))
a.block_until_ready(); b.block_until_ready()
t0 = time.time()
a.copy_to_host_async(); b.copy_to_host_async()
_ = np.asarray(a); _ = np.asarray(b)
print(f"Q2 async: {(time.time()-t0)*1000:.1f} ms", flush=True)

# Q4: full-duplex? upload 4MB while a fresh download in flight
up = np.frombuffer(corpus, np.uint8).copy() + 3
a = mk(jnp.uint32(301)); a.block_until_ready()
t0 = time.time()
a.copy_to_host_async()
d = jnp.asarray(up); d.block_until_ready()
t_up = time.time() - t0
_ = np.asarray(a)
t_both = time.time() - t0
print(f"Q4 upload-with-download-in-flight: up {t_up*1000:.1f}, "
      f"both {t_both*1000:.1f} ms", flush=True)
# references alone
a = mk(jnp.uint32(302)); a.block_until_ready()
t0 = time.time(); _ = np.asarray(a)
print(f"  (download alone {(time.time()-t0)*1000:.1f} ms)", flush=True)
t0 = time.time(); d = jnp.asarray(up + 1); d.block_until_ready()
print(f"  (upload alone {(time.time()-t0)*1000:.1f} ms)", flush=True)
print("DONE", flush=True)
