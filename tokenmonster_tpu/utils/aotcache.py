"""AOT-compiled executable cache for the device tokenizer.

On this rig Mosaic kernels compile through a REMOTE compile service that
sits outside JAX's persistent compilation cache, so a "warm" bench still
pays minutes of kernel compiles with unbounded variance (BENCH_r04
measured t_warm_ms from 90 s to 505 s for the same code).  The fix: AOT
(lower+compile) each fused pipeline once and serialize the finished
executable (jax.experimental.serialize_executable) — Mosaic binaries are
embedded in the serialized artifact, so a later process loads it without
touching any compiler.

Cache keys include the jax version, device kind, a fingerprint of the
kernel source files, and the caller's geometry/vocab fingerprint — any
code or table change misses cleanly and recompiles.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle

log = logging.getLogger(__name__)


def code_fingerprint() -> str:
    """Hash of the ops package sources: kernel edits invalidate the cache."""
    from .. import ops as ops_pkg
    d = os.path.dirname(ops_pkg.__file__)
    h = hashlib.sha256()
    for name in sorted(os.listdir(d)):
        if name.endswith(".py"):
            with open(os.path.join(d, name), "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:16]


def device_fingerprint() -> str:
    import jax
    d = jax.devices()[0]
    return f"{jax.__version__}-{d.platform}-{getattr(d, 'device_kind', '?')}" \
        .replace(" ", "_")


def cached_compile(key: str, jitted, avals, cache_dir: str):
    """Compile ``jitted`` for ``avals`` (ShapeDtypeStructs or arrays),
    caching the serialized executable under ``cache_dir/key.aot``.

    Returns a callable (jax Compiled — call with arrays matching avals) or
    None when both the cache load and the serialization round-trip are
    unavailable (caller keeps the plain jitted function)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, key + ".aot")
    if os.path.exists(path):
        try:
            from jax.experimental.serialize_executable import \
                deserialize_and_load
            with open(path, "rb") as f:
                ser, in_tree, out_tree = pickle.load(f)
            return deserialize_and_load(ser, in_tree, out_tree)
        except Exception:
            log.warning("aot cache load failed for %s; recompiling", key,
                        exc_info=True)
    try:
        comp = jitted.lower(*avals).compile()
    except Exception:
        log.warning("aot lower/compile failed for %s", key, exc_info=True)
        return None
    try:
        from jax.experimental.serialize_executable import serialize
        ser, in_tree, out_tree = serialize(comp)
        with open(path + ".tmp", "wb") as f:
            pickle.dump((ser, in_tree, out_tree), f)
        os.replace(path + ".tmp", path)
    except Exception:
        log.warning("aot serialize failed for %s (executable still usable)",
                    key, exc_info=True)
    return comp
