"""Long-genome device path on real TPU: synthetic bacterial-shaped
genome pairs (2-5 Mb, ~95% ANI with indels + a repeat island) parsed on
the HBM-resident big kernel with tuned params (mal/msl/reg scaled up per
the reference's guidance for bacteria), byte-exact vs the native oracle.

BASELINE.json configs[4] coverage: the round-2 device path refused refs
above ~350 kb; this is the round-3 closure (VERDICT item 2).

Usage: python scripts/test_big_tpu.py [Mb] [n_genomes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops.pallas_engine import all2all_pallas
from lzani_tpu.params import Params

MB = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def synth_bacteria(rng, L):
    """Bacterial-shaped: a genome with an rRNA-like repeat island (7
    copies of a 5 kb unit) + IS-element repeats (30 copies of 1.2 kb)."""
    g = rng.randint(0, 4, L).astype(np.uint8)
    unit = rng.randint(0, 4, 5000).astype(np.uint8)
    for k in range(7):
        p = rng.randint(0, L - 6000)
        g[p:p + 5000] = unit
    is_el = rng.randint(0, 4, 1200).astype(np.uint8)
    for k in range(30):
        p = rng.randint(0, L - 1500)
        g[p:p + 1200] = is_el
    return g


def relative(rng, g, div=0.05):
    q = g.copy()
    m = rng.rand(len(q)) < div
    q[m] = (q[m] + rng.randint(1, 4, m.sum())) % 4
    for _ in range(20):  # structural indels
        k = rng.randint(0, len(q) - 5000)
        if rng.rand() < 0.5:
            q = np.delete(q, slice(k, k + rng.randint(100, 3000)))
        else:
            ins = rng.randint(0, 4, rng.randint(100, 3000)).astype(np.uint8)
            q = np.concatenate([q[:k], ins, q[k:]])
    return np.ascontiguousarray(q)


def main():
    rng = np.random.RandomState(17)
    L = int(MB * 1e6)
    g = synth_bacteria(rng, L)
    codes = [g] + [relative(rng, g, div=0.03 + 0.03 * k)
                   for k in range(N - 1)]
    codes.sort(key=len, reverse=True)
    # tuned long-genome params (reference README: mal/msl/reg scaled up)
    p = Params()
    p.min_anchor_len = 20
    p.min_seed_len = 11
    p.min_region_len = 80
    print(f"genomes: {[len(c) for c in codes]}", flush=True)
    t0 = time.perf_counter()
    want = ne.all2all(codes, p)
    t_nat = time.perf_counter() - t0
    print(f"native oracle: {t_nat:.1f}s", flush=True)
    t0 = time.perf_counter()
    got = all2all_pallas(codes, p)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    got2 = all2all_pallas(codes, p)
    t_warm = time.perf_counter() - t0
    pairs = N * (N - 1)
    ok = np.array_equal(got, want) and np.array_equal(got2, want)
    print(f"big TPU {MB:.0f}Mb x{N}: {'EXACT' if ok else 'MISMATCH'} "
          f"pairs={pairs} cold={t_cold:.0f}s warm={t_warm:.1f}s "
          f"({pairs / t_warm:.2f} pairs/s vs native "
          f"{pairs / t_nat:.2f})", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
