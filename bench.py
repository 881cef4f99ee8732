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
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

# Persistent XLA compilation cache: first-ever compile of the fused kernel
# through the axon tunnel can take minutes; cached reloads take seconds.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".tmp", "jaxcache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# Wall-clock budget for the TPU measurement (run in a watchdog subprocess —
# a cold XLA compile must never starve the bench of its output line).
TPU_BUDGET_S = int(os.environ.get("TM_BENCH_TPU_BUDGET_S", "560"))

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
TARGET_BPS = 1e9       # BASELINE.md framework target: 1 GB/s/chip


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


def build_capcode_vocab():
    """Production-shape capcode-2 vocabulary: the gpt2 token set re-generated
    at capcode level 2, which defines a delete token (the "D" marker single-
    byte token, go/tokenmonster.go:3475-3478) and ~20k space-prefixed
    entries — the vocabulary class every TokenMonster-trained vocab belongs
    to, exercising the forward-delete device path."""
    cache = os.path.join(_HERE, ".tmp", "gpt2_cc2_bench.vocab")
    from tokenmonster_tpu.core.vocab import Vocab
    if os.path.exists(cache):
        return Vocab.load(cache)
    v0 = build_vocab()
    v = Vocab()
    v._generate(tokens=list(v0.tokens), charset=1, normalize_string="none",
                using_capcode=2, level=5, reset_token_ids=True)
    try:
        v.save(cache)
    except OSError:
        pass
    return v


def fnv1a64(ids) -> int:
    """FNV-1a over the little-endian u32 id stream (pure-Python
    byte loop: ~0.7 s/M ids — acceptable at bench sizes)."""
    h = 0xCBF29CE484222325
    for b in np.asarray(ids, np.uint32).astype("<u4").tobytes():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _tpu_child():
    """Measure the TPU path; prints one JSON line. Run under a watchdog.

    Two numbers:
      tpu_device_bps — device-resident sustained throughput: input staged in
        HBM, chained dispatches, dense ids left on device.  This is the
        production-representative per-chip rate (a real host feeds chips
        over PCIe/ICI; this rig's axon tunnel adds ~120 ms per host sync,
        so transfers are benched separately).
      tpu_e2e_bps — full tokenize() including tunnel upload + id download.

    Timing honesty: on the axon tunnel ``jax.block_until_ready`` returns
    before the device finishes, so every measurement below enqueues its reps
    and then *fetches a scalar* from the final output — the device stream is
    ordered, so that fetch bounds the true completion time (it also pays one
    tunnel round-trip, making the reported rate slightly pessimistic).
    Per-phase wall-clock marks are reported in the details.
    """
    t_start = time.time()
    out = {}

    def mark(key):
        out[key] = round((time.time() - t_start) * 1000)

    def left():
        return TPU_BUDGET_S - (time.time() - t_start)

    corpus = (SEED_TEXT * (CORPUS_MB * MB // len(SEED_TEXT) + 1))[:CORPUS_MB * MB]
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    aot_dir = os.path.join(_HERE, ".tmp", "aotcache")

    def _cache_entries():
        try:
            return len(os.listdir(cache_dir))
        except OSError:
            return 0

    try:
        import numpy as _np

        import jax
        from tokenmonster_tpu.ops.scan import TpuTokenizer
        mark("t_import_ms")
        vocab = build_vocab()
        mark("t_vocab_ms")
        tk = TpuTokenizer(vocab, chunk=2048)
        out["engine"] = tk.engine
        mark("t_tables_ms")  # hash/AC table build + device upload
        out["jaxcache_before"] = _cache_entries()
        staged = tk.stage(corpus)
        # AOT warm: load (or compile+persist) the finished executables —
        # the Mosaic remote compile is outside the persistent XLA cache on
        # this rig, so only executable serialization bounds warm time
        # (VERDICT r4 #3; 90-505 s live-compile variance)
        out["aot_hit"] = bool(tk.warm_aot(staged, aot_dir))
        mark("t_aot_ms")
        res = tk.tokenize_staged(staged)  # warm: exactness certificate run
        mark("t_warm_ms")
        # persistent-cache diagnostics: entries added == compile-cache misses
        # this run; a warm cache must show 0 added (VERDICT r2 weak #3)
        out["jaxcache_added"] = _cache_entries() - out["jaxcache_before"]
        assert res is not None, "device stitch failed to sync"
        ids_t, _missing = res
        out["tpu_n_tokens"] = int(len(ids_t))
        # full-id checksum FIRST (before any throughput loop): certifies
        # the COMPILED kernels' output on real hardware (pytest runs
        # interpret-mode on CPU) — compared against native in main()
        out["tpu_ids_fnv"] = str(fnv1a64(ids_t))
        mark("t_fnv_ms")

        # capcode-2 (forward-delete) vocabulary: the vocabulary class every
        # TokenMonster-trained vocab belongs to.  Its exactness certificate
        # comes BEFORE the throughput loops so a slow warm can never push
        # it out of the driver artifact (VERDICT r4 weak #1).
        tkc = staged_c = data_cc = None
        try:
            from tokenmonster_tpu.core.vocab import normalize_and_capcode
            vc = build_capcode_vocab()
            data_cc = normalize_and_capcode(corpus, 2, vc.normalizer)
            tkc = TpuTokenizer(vc, chunk=2048)
            out["capcode_engine"] = tkc.engine
            mark("t_cc_tables_ms")
            staged_c = tkc.stage(data_cc)
            out["aot_hit_capcode"] = bool(tkc.warm_aot(staged_c, aot_dir))
            res_c = tkc.tokenize_staged(staged_c)   # warm + exactness
            mark("t_cc_warm_ms")
            if res_c is not None:
                ids_c, _miss_c = res_c
                out["capcode_n_tokens"] = int(len(ids_c))
                out["tpu_capcode_ids_fnv"] = str(fnv1a64(ids_c))
                out["capcode_corpus_bytes"] = len(data_cc)
            else:
                out["capcode_error"] = "device stitch failed to sync"
        except Exception as e:
            out["capcode_error"] = str(e)[:160]

        # tunnel sync round-trip latency (for interpreting the numbers):
        # both jitted fns are compiled + fetched once before the timed
        # fetch, so the interval measures only the sync round-trip
        f2 = jax.jit(lambda a: a + 2)
        z = jax.jit(lambda a: a + 1)(jax.numpy.zeros((8, 128), jax.numpy.int32))
        _ = float(z[0, 0])
        _ = float(f2(z)[0, 0])
        t0 = time.time()
        _ = float(f2(z)[0, 0])
        rtt = time.time() - t0
        out["tunnel_rtt_ms"] = round(rtt * 1000, 1)

        # device-resident sustained: queued dispatch chains + one scalar
        # fetch.  The first loop after compilation measures high on this
        # rig (DESIGN.md methodology) — run a throwaway loop first, then
        # a longer steady-state loop.
        for _ in range(2):
            outs = tk._run_staged(staged)
        _ = [int(o[1]) for o in outs]
        reps = 10
        dt = None
        for _loop in range(2):   # best-of-2 sustained loops (the native
            t0 = time.time()     # side is best-of-N for the same reason:
            for _ in range(reps):  # tunnel/ambient run-to-run variance)
                outs = tk._run_staged(staged)
            _ = [int(o[1]) for o in outs]  # stream-ordered: bounds completion
            d = (time.time() - t0) / reps
            dt = d if dt is None else min(dt, d)
        out["tpu_device_bps"] = round(len(corpus) / dt)
        mark("t_device_bench_ms")

        # end-to-end including tunnel transfers
        best_dt = None
        for _ in range(2):
            t0 = time.time()
            res = tk.tokenize_staged(tk.stage(corpus))
            dt = time.time() - t0
            if res is not None and (best_dt is None or dt < best_dt):
                best_dt = dt
        out["tpu_e2e_bps"] = round(len(corpus) / best_dt)
        out["device"] = str(jax.devices()[0])

        # capcode-2 sustained throughput
        if staged_c is not None and "tpu_capcode_ids_fnv" in out \
                and left() > 60:
            outs_c = tkc._run_staged(staged_c)   # steady-state entry
            _ = [int(o[1]) for o in outs_c]
            reps = 6
            dt = None
            for _loop in range(2):
                t0 = time.time()
                for _ in range(reps):
                    outs_c = tkc._run_staged(staged_c)
                _ = [int(o[1]) for o in outs_c]
                d = (time.time() - t0) / reps
                dt = d if dt is None else min(dt, d)
            out["tpu_device_bps_capcode"] = round(len(data_cc) / dt)
            mark("t_cc_bench_ms")

        # real-text row (VERDICT r4 weak #7): CHD hit rates, follow
        # early-exit and stitch density are text-dependent — certify a
        # second id stream over real corpus bytes when one is available
        rt_path = os.path.join(_HERE, ".tmp", "real_corpus.bin")
        if not os.path.exists(rt_path):
            alt = os.path.join(_HERE, ".tmp", "corpus_r5_train.bin")
            if os.path.exists(alt):
                rt_path = alt
            else:
                # scratch got wiped: regenerate deterministically from
                # on-rig sources (tools/measure/build_real_corpus.py)
                try:
                    subprocess.run(
                        [sys.executable,
                         os.path.join(_HERE, "tools", "measure",
                                      "build_real_corpus.py")],
                        check=True, timeout=120,
                        stdout=subprocess.DEVNULL)
                except Exception:
                    pass
        if os.path.exists(rt_path) and left() > 45:
            with open(rt_path, "rb") as f:
                real = f.read(CORPUS_MB * MB)
            real = vocab.normalizer.normalize(real)
            staged_r = tk.stage(real)
            # real text can be denser than 2.7 bytes/record (long
            # space/punct runs): AOT the full-window retry variant too
            out["aot_hit_full"] = bool(
                tk.warm_aot(staged_r, aot_dir, modes=(True,)))
            res_r = tk.tokenize_staged(staged_r)
            if res_r is not None:
                out["tpu_realtext_ids_fnv"] = str(fnv1a64(res_r[0]))
                out["realtext_n_tokens"] = int(len(res_r[0]))
                out["realtext_bytes"] = len(real)
                out["realtext_window"] = tk.last_mode
                use_full = tk.last_mode == "full"
                outs_r = tk._run_staged(staged_r, full=use_full)
                _ = [int(o[1]) for o in outs_r]
                reps = 6
                dt = None
                for _loop in range(2):
                    t0 = time.time()
                    for _ in range(reps):
                        outs_r = tk._run_staged(staged_r, full=use_full)
                    _ = [int(o[1]) for o in outs_r]
                    d = (time.time() - t0) / reps
                    dt = d if dt is None else min(dt, d)
                out["tpu_device_bps_realtext"] = round(len(real) / dt)
                mark("t_rt_bench_ms")
    except Exception as e:  # pragma: no cover
        out["tpu_error"] = str(e)[:160]
    print(json.dumps(out), flush=True)


def main():
    corpus = (SEED_TEXT * (CORPUS_MB * MB // len(SEED_TEXT) + 1))[:CORPUS_MB * MB]
    vocab = build_vocab()

    details = {}
    n_tokens = None

    # --- native C++ path (best-of-N to damp noisy-neighbour variance) ---
    native_bps = 0.0
    ids = None
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
    # Run in a subprocess with a hard wall-clock budget: a cold XLA compile
    # through the device tunnel can take minutes and must not prevent the
    # bench from printing its result line.
    tpu_bps = 0.0
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tpu-child"],
            capture_output=True, timeout=TPU_BUDGET_S, cwd=_HERE)
        child = json.loads(proc.stdout.decode().strip().splitlines()[-1])
        if "tpu_device_bps" in child or "tpu_e2e_bps" in child:
            tpu_bps = max(float(child.get("tpu_device_bps", 0)),
                          float(child.get("tpu_e2e_bps", 0)))
            if n_tokens is not None and child.get("tpu_n_tokens"):
                assert child["tpu_n_tokens"] == n_tokens, \
                    "TPU/native token mismatch"
            if ids is not None and child.get("tpu_ids_fnv"):
                # compiled-kernel exactness certificate: the device id
                # stream must checksum-match the native tokenizer's
                match = child["tpu_ids_fnv"] == str(fnv1a64(ids))
                details["ids_fnv_match"] = match
                assert match, "TPU/native id stream checksum mismatch"
        details.update(child)
    except subprocess.TimeoutExpired:
        details["tpu_error"] = f"budget exceeded ({TPU_BUDGET_S}s)"
    except Exception as e:  # pragma: no cover
        details["tpu_error"] = str(e)[:120]

    # --- real-text row: native side + FNV certificate ---
    if details.get("tpu_realtext_ids_fnv"):
        try:
            from tokenmonster_tpu import native
            rt_path = os.path.join(_HERE, ".tmp", "real_corpus.bin")
            if not os.path.exists(rt_path):
                rt_path = os.path.join(_HERE, ".tmp", "corpus_r5_train.bin")
            with open(rt_path, "rb") as f:
                real = f.read(CORPUS_MB * MB)   # same prefix as the child
            real = vocab.normalizer.normalize(real)
            assert len(real) == details["realtext_bytes"]
            nv = native.NativeVocab(vocab)
            ids_r, _m = nv.tokenize(real)
            best_dt = None
            for _ in range(3):
                t0 = time.time()
                ids_r, _m = nv.tokenize(real, threads=1)
                dt = time.time() - t0
                best_dt = dt if best_dt is None else min(best_dt, dt)
            details["native_cxx_realtext_bps"] = round(len(real) / best_dt)
            match = (details["tpu_realtext_ids_fnv"] == str(fnv1a64(ids_r)))
            details["ids_fnv_match_realtext"] = match
            assert match, "realtext TPU/native id stream checksum mismatch"
        except Exception as e:  # pragma: no cover
            details["realtext_native_error"] = str(e)[:120]

    # --- capcode-2 vocabulary: native side of the comparison ---
    if details.get("tpu_capcode_ids_fnv"):
        try:
            from tokenmonster_tpu import native
            from tokenmonster_tpu.core.vocab import normalize_and_capcode
            vc = build_capcode_vocab()
            data_cc = normalize_and_capcode(corpus, 2, vc.normalizer)
            nvc = native.NativeVocab(vc)
            ids_c, _m = nvc.tokenize(data_cc)   # warm
            best_dt = None
            for _ in range(4):
                t0 = time.time()
                ids_c, _m = nvc.tokenize(data_cc, threads=1)
                dt = time.time() - t0
                best_dt = dt if best_dt is None else min(best_dt, dt)
            details["native_cxx_capcode_bps"] = round(len(data_cc) / best_dt)
            match = (details.get("tpu_capcode_ids_fnv")
                     == str(fnv1a64(ids_c)))
            details["ids_fnv_match_capcode"] = match
            assert details.get("capcode_n_tokens") in (None, len(ids_c))
            assert match, "capcode TPU/native id stream checksum mismatch"
        except Exception as e:  # pragma: no cover
            details["capcode_native_error"] = str(e)[:120]

    # --- auxiliary reference-table metrics (tokenmonster-cpp/README.md:62-71:
    # the reference benches tokenize / decode / round-trip separately) ---
    try:
        t0 = time.time()
        norm = vocab.normalizer.normalize(corpus)
        details["normalize_bps"] = round(len(corpus) / (time.time() - t0))
        if native_bps == 0.0:
            # native path failed: obtain ids from the host oracle so the
            # decode/serialize metrics still report
            ids, _m = vocab.tokenize(corpus)
        ids_a = np.asarray(ids)
        decoded = vocab.decode(ids_a)  # warm the blob cache
        best_dt = None
        for _ in range(3):
            t0 = time.time()
            decoded = vocab.decode(ids_a)
            dt = time.time() - t0
            if best_dt is None or dt < best_dt:
                best_dt = dt
        details["decode_bps"] = round(len(decoded) / best_dt)
        assert decoded == norm[:len(decoded)] or decoded == norm, \
            "decode round-trip mismatch"
        # serialized round-trip (16/24/32-bit auto width)
        t0 = time.time()
        ser, enc_len, _m = vocab.tokenize_to_serialized(corpus)
        deser = vocab.deserialize(ser, enc_len)
        details["serialize_roundtrip_bps"] = round(
            len(corpus) / (time.time() - t0))
        assert np.array_equal(np.asarray(deser), ids_a)
    except Exception as e:  # pragma: no cover
        details["aux_error"] = str(e)[:120]

    # Headline = the best path, but labeled by what was actually measured:
    # the TPU device path only claims "per chip" once it beats the host C++
    # tokenizer (VERDICT r2: never report a CPU number as a chip number).
    tpu_device = float(details.get("tpu_device_bps", 0))
    if tpu_device >= native_bps:
        value = tpu_device
        metric = "tokenize bytes/sec/chip (TPU device path, gpt2-50k, exact ids)"
    else:
        value = max(tpu_bps, native_bps)
        metric = ("tokenize bytes/sec (best path = host C++ single-core, "
                  "gpt2-50k, exact ids)")
    details["corpus_bytes"] = len(corpus)
    details["vs_target_1gbps"] = round(tpu_device / TARGET_BPS, 4)
    if n_tokens:
        details["chars_per_token"] = round(len(corpus) / n_tokens, 3)
    result = {
        "metric": metric,
        "value": round(value),
        "unit": "bytes/sec",
        "vs_baseline": round(value / BASELINE_BPS, 3),
        "details": details,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--tpu-child" in sys.argv:
        _tpu_child()
    else:
        main()
