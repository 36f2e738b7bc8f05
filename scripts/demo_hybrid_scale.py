"""Long-run hybrid demonstration: on a set large enough that the native
pool alone needs several minutes, the device's lazy warm-up completes
mid-run and the scheduler lets it claim short tail rows — total
throughput = native + whatever the profitability throttles admit, and
the result stays byte-exact.

Synthesizes a clustered genome mix (related families + unrelated
singletons, ~8-16 kb), runs pure-native (timed), then hybrid (timed,
stats), and reports both. ~15-25 min wall on the dev host.

Usage: python scripts/demo_hybrid_scale.py [n_genomes]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def synth(n, rng):
    # similarity-dense mix (low mutation, few singletons): per-pair cost
    # approaches the vir61 regime, so the native pool needs minutes and
    # the device warm-up completes well inside the run
    fams = max(4, n // 50)
    bases = [rng.randint(0, 4, int(rng.randint(8000, 16000))
                         ).astype(np.uint8) for _ in range(fams)]
    out = []
    for k in range(n):
        if rng.rand() < 0.1:  # unrelated singleton
            out.append(rng.randint(0, 4, int(rng.randint(8000, 16000))
                                   ).astype(np.uint8))
            continue
        b = bases[int(rng.randint(fams))]
        c = b.copy()
        m = rng.rand(len(c)) < rng.uniform(0.01, 0.10)
        c[m] = (c[m] + rng.randint(1, 4, m.sum())) % 4
        lo = int(rng.randint(0, len(c) // 4))
        out.append(c[lo:lo + int(rng.randint(len(c) // 2,
                                             len(c) - lo))].copy())
    out.sort(key=len, reverse=True)  # store reorder invariant
    return out


def main():
    from lzani_tpu.core import native_engine as ne
    from lzani_tpu.params import Params

    rng = np.random.RandomState(42)
    codes = synth(N, rng)
    pairs = N * (N - 1)
    print(f"{N} genomes, {pairs} pairs, "
          f"{sum(map(len, codes))/1e6:.1f} Msym", flush=True)

    p = Params()
    p.no_threads = os.cpu_count() or 1

    t0 = time.perf_counter()
    ref = ne.all2all(codes, p)
    nat_s = time.perf_counter() - t0
    print(f"native : {pairs/nat_s:8.1f} pairs/s  ({nat_s:.0f}s)",
          flush=True)

    from lzani_tpu.ops.pallas_engine import all2all_hybrid

    hst = {}
    t0 = time.perf_counter()
    out = all2all_hybrid(codes, p, stats=hst)
    hyb_s = time.perf_counter() - t0
    exact = np.array_equal(ref, out)
    print(f"hybrid : {pairs/hyb_s:8.1f} pairs/s  ({hyb_s:.0f}s)  "
          f"exact={exact}", flush=True)
    print(f"  warm_started={hst['warm_started']} warm_s={hst['warm_s']} "
          f"tpu_pairs={hst['tpu_pairs']} cpu_pairs={hst['cpu_pairs']} "
          f"t_unit={hst['t_unit_s']}", flush=True)
    print(f"speedup vs native: {nat_s/hyb_s:.3f}x", flush=True)
    return 0 if exact else 1


if __name__ == "__main__":
    raise SystemExit(main())
