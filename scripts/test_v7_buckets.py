"""Validate the v7 kernel at the larger VMEM buckets (LqP 2^17 / 2^18)
end-to-end on the real TPU: synthetic long-genome sets through
all2all_pallas with sim=1 at the given interleave, triples compared to the
native oracle. The small buckets (2^16) are covered by ab_kernel /
ab_dissimilar / the vir61 golden; this closes the rest of the v7 auto
envelope before the default flip.

Usage: python scripts/test_v7_buckets.py [target_len] [n] [ilv]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops.pallas_engine import all2all_pallas
from lzani_tpu.params import Params

TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ILV = int(sys.argv[3]) if len(sys.argv) > 3 else 2


def synth(rng, n, target):
    """Mixed family set: mutated copies + indels + unrelated genomes."""
    base = rng.randint(0, 4, target).astype(np.uint8)
    out = []
    for i in range(n):
        if i % 3 == 2:
            out.append(rng.randint(
                0, 4, target - rng.randint(0, target // 8)).astype(np.uint8))
            continue
        c = base.copy()
        m = rng.rand(len(c)) < [0.02, 0.10][i % 2]
        c[m] = (c[m] + rng.randint(1, 4, m.sum())) % 4
        if i % 4 == 1:  # indel: delete a block
            lo = rng.randint(0, len(c) // 2)
            c = np.concatenate([c[:lo], c[lo + rng.randint(100, 5000):]])
        out.append(c)
    return out


def main():
    rng = np.random.RandomState(23)
    codes = synth(rng, N, TARGET)
    p = Params()
    p.no_threads = os.cpu_count() or 1
    ref = ne.all2all(codes, p)
    t0 = time.time()
    got = all2all_pallas(codes, p, sim=1, ilv=ILV)
    dt = time.time() - t0
    ok = np.array_equal(ref, got)
    pairs = N * (N - 1)
    print(f"target_len={TARGET} n={N} ilv={ILV} sim=1: "
          f"{'EXACT' if ok else 'MISMATCH'} "
          f"({dt:.0f}s cold, {pairs} pairs)", flush=True)
    if ok:
        t0 = time.time()
        all2all_pallas(codes, p, sim=1, ilv=ILV)
        print(f"warm: {pairs / (time.time() - t0):.1f} pairs/s", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
