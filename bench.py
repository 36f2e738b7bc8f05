#!/usr/bin/env python
"""Benchmark harness: all-vs-all ANI on the vir61 set (61 virus genomes,
the reference's CI anchor — /root/reference/test/vir61).

Prints ONE JSON line:
  {"metric": "vir61_pairs_per_s", "value": N, "unit": "pairs/s",
   "vs_baseline": N}

`vs_baseline` is the speedup over the reference-equivalent CPU path
(the native host engine at hardware thread count), measured in the same
process. The device backend is used when a TPU/accelerator is present;
correctness of the timed run is asserted against the native oracle.
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
    else:  # fall back to the example multifasta shipped in tests
        p.input_file_names = [
            os.path.join(REPO, "tests", "data", "multifasta.fna")]
    from lzani_tpu.io.fasta import load_store

    store = load_store(p)
    store.reorder()
    return p, store


def main() -> int:
    p, store = load_vir61()
    codes = store.codes
    n = len(codes)
    pairs = n * (n - 1)

    # --- CPU baseline: native engine, reference-equivalent semantics ------
    from lzani_tpu.core import native_engine

    p.no_threads = os.cpu_count() or 1
    native_engine.all2all(codes, p)  # warm (JIT .so build, page-in)
    t0 = time.perf_counter()
    ref_out = native_engine.all2all(codes, p)
    cpu_dt = time.perf_counter() - t0
    cpu_rate = pairs / cpu_dt

    # --- device engine ----------------------------------------------------
    rate = cpu_rate
    backend = "native-cpu"
    if os.environ.get("BENCH_FORCE_JAX"):
        import jax
        from lzani_tpu.ops.engine_jax import all2all_jax

        all2all_jax(codes, p)  # warm: compile every bucket variant
        t0 = time.perf_counter()
        dev_out = all2all_jax(codes, p)
        dev_dt = time.perf_counter() - t0
        import numpy as np

        assert np.array_equal(np.asarray(dev_out), np.asarray(ref_out)), \
            "device engine diverged from native oracle"
        rate = pairs / dev_dt
        backend = jax.default_backend()

    print(json.dumps({
        "metric": "vir61_pairs_per_s",
        "value": round(rate, 1),
        "unit": "pairs/s",
        "vs_baseline": round(rate / cpu_rate, 3),
        "backend": backend,
        "cpu_baseline_pairs_per_s": round(cpu_rate, 1),
        "n_genomes": n,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
