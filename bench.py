#!/usr/bin/env python
"""Benchmark harness: all-vs-all ANI on the vir61 set (61 virus genomes,
the reference's CI anchor — /root/reference/test/vir61).

Prints ONE JSON line:
  {"metric": "vir61_pairs_per_s", "value": N, "unit": "pairs/s",
   "vs_baseline": N, ...}

The headline is the production backend (native CPU engine — the
reference-equivalent path that produces byte-exact golden output);
`vs_baseline` compares against the same engine, so 1.0 = reference parity.
The TPU event-log kernel (ops/pallas_engine.py) is additionally measured
on a genome subset and reported as `pallas_pairs_per_s` with its
exactness asserted against the oracle. Set BENCH_SKIP_PALLAS=1 to skip
the device measurement (e.g. no accelerator attached).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

VIR61 = "/root/reference/test/vir61"


def load_vir61():
    from lzani_tpu.params import Params

    p = Params()
    if os.path.isdir(VIR61):
        p.input_file_names = sorted(
            os.path.join(VIR61, f) for f in os.listdir(VIR61))
    else:
        p.input_file_names = [
            os.path.join(REPO, "tests", "data", "multifasta.fna")]
    from lzani_tpu.io.fasta import load_store

    store = load_store(p)
    store.reorder()
    return p, store


def main() -> int:
    import numpy as np

    p, store = load_vir61()
    codes = store.codes
    n = len(codes)
    pairs = n * (n - 1)

    # --- CPU production backend (reference-equivalent) --------------------
    from lzani_tpu.core import native_engine

    p.no_threads = os.cpu_count() or 1
    native_engine.all2all(codes, p)  # warm (.so build, page-in)
    t0 = time.perf_counter()
    ref_out = native_engine.all2all(codes, p)
    cpu_dt = time.perf_counter() - t0
    cpu_rate = pairs / cpu_dt

    result = {
        "metric": "vir61_pairs_per_s",
        "value": round(cpu_rate, 1),
        "unit": "pairs/s",
        "vs_baseline": 1.0,
        "backend": "native-cpu",
        "n_genomes": n,
        "threads": p.no_threads,
    }

    # --- TPU event-log kernel on a subset ---------------------------------
    if not os.environ.get("BENCH_SKIP_PALLAS"):
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(REPO, ".jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 10.0)
            if jax.default_backend() != "cpu":
                from lzani_tpu.ops.pallas_engine import all2all_pallas

                if os.environ.get("BENCH_PALLAS_FULL"):
                    sub = codes          # full set (more Mosaic compiles)
                else:
                    sub = codes[:12]     # one shape bucket
                sub_pairs = len(sub) * (len(sub) - 1)
                all2all_pallas(sub, p)  # warm/compile
                t0 = time.perf_counter()
                dev_out = all2all_pallas(sub, p)
                dev_dt = time.perf_counter() - t0
                exact = np.array_equal(
                    dev_out, ref_out[:len(sub), :len(sub) - 1]
                    if len(sub) < n else ref_out)
                result["pallas_pairs_per_s"] = round(sub_pairs / dev_dt, 1)
                result["pallas_n_genomes"] = len(sub)
                result["pallas_exact"] = bool(exact)
                result["pallas_backend"] = jax.default_backend()
        except Exception as e:  # report, never fail the bench
            result["pallas_error"] = str(e)[:200]

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
