"""Honest-throttle hybrid-vs-native probe on the dissimilar regime at a
queue long enough (~170 s at N=1000) for the lazy warm-up to engage at
NORMAL priority (projection >= 60 s, ops/hybrid.py) and for the duty
controller to admit device claims. This is the VERDICT r4 item-5
artifact: hybrid must beat native WITH tpu_pairs > 0, byte-exact, no
greedy override.

Shape buckets are primed once through `all2all_pallas` at the same
batch width the hybrid engine uses (B=64), exactly as bench.py does —
Mosaic compiles are one-time costs served by the persistent cache, not
part of the steady-state claim.

LZANI_PROBE_THREADS pins the native pool width for BOTH runs (default:
all cores). On this 4-vCPU tunnel host the saturated-pool case loses —
the device's idle-priority host-side work (dispatch prep, downloads,
replay) is starved and its contribution can't exceed its displacement
(measured: one claimed group, +23 s). threads=2 emulates the
production host shape (v5e-16: 56 vCPU/chip — the pool always leaves
the device's host tax spare cores): same pool width for native and
hybrid, so any hybrid win is pure device contribution.

Usage: python scripts/probe_hybrid_dissim.py [n_genomes] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import ab_dissimilar as abd

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main():
    from lzani_tpu.core import native_engine as ne
    from lzani_tpu.params import Params

    abd.N = N
    codes = abd.synth()
    pairs = N * (N - 1)
    print(f"{N} genomes, {pairs} pairs, "
          f"{sum(map(len, codes))/1e6:.1f} Msym", flush=True)

    p = Params()
    p.no_threads = int(os.environ.get("LZANI_PROBE_THREADS",
                                      os.cpu_count() or 1))
    print(f"pool threads: {p.no_threads}", flush=True)
    ref = ne.all2all(codes[:64], p)  # .so build / page-in

    from lzani_tpu.ops.pallas_engine import all2all_pallas, all2all_hybrid

    t0 = time.perf_counter()
    all2all_pallas(codes[:65], p)  # prime B=64 bucket programs
    print(f"prime  : {time.perf_counter()-t0:.1f}s", flush=True)

    nat_dt = hyb_dt = 1e9
    hst = {}
    ref = out = None
    for rep in range(REPS):
        t0 = time.perf_counter()
        r = ne.all2all(codes, p)
        dt = time.perf_counter() - t0
        nat_dt = min(nat_dt, dt)
        ref = r
        print(f"native : rep{rep} {pairs/dt:8.1f} pairs/s ({dt:.0f}s)",
              flush=True)
        st = {}
        t0 = time.perf_counter()
        o = all2all_hybrid(codes, p, stats=st)
        dt = time.perf_counter() - t0
        print(f"hybrid : rep{rep} {pairs/dt:8.1f} pairs/s ({dt:.0f}s) "
              f"tpu_pairs={st.get('tpu_pairs')} "
              f"warm_started={st.get('warm_started')} "
              f"warm_s={st.get('warm_s')} "
              f"duty_latched={st.get('duty_latched')}", flush=True)
        if dt < hyb_dt:
            hyb_dt, hst, out = dt, st, o
    exact = np.array_equal(ref, out)
    print(f"BEST native {pairs/nat_dt:.1f} | hybrid {pairs/hyb_dt:.1f} "
          f"pairs/s | hybrid_vs_native {nat_dt/hyb_dt:.4f} | "
          f"tpu_pairs {hst.get('tpu_pairs')} | exact={exact}", flush=True)
    return 0 if exact else 1


if __name__ == "__main__":
    raise SystemExit(main())
