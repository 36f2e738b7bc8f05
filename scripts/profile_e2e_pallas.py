"""Attribute the END-TO-END warm all2all_pallas(vir61) wall time.

The round-4 kernel path is ~0.47-0.52 s/group x 16 groups ~= 7.6-8.3 s,
but the driver bench records ~10.2 s end-to-end — ~25-30% of wall is
outside the kernel (VERDICT r4 item 2). This script hooks every host-side
phase of the production driver with interval timers (per-thread-safe
accumulators) and reports, for ONE warm run:

    engine_build   PallasAll2All construction (query pack + upload)
    enumerate      rows_ok/groups/units enumeration (pure host)
    index_build    build_group_index calls (sum; overlapped on pool)
    dispatch       dispatch_group calls (main thread, serial)
    collect        collect_group calls (dl_pool; downloads)
    finalize       replay/store per pair (pool; overlapped)
    main_loop      the dispatch for-loop wall (incl. idx_futs waits)
    tail           everything after the last dispatch returns
    wall           whole all2all_pallas call

plus device-occupancy gaps estimated from dispatch/collect timestamps.
Run on the TPU (one process at a time!).
"""
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VIR61 = "/root/reference/test/vir61"


class Acc:
    def __init__(self):
        self.lock = threading.Lock()
        self.t = {}
        self.n = {}
        self.spans = {}

    def add(self, key, dt, t0=None, t1=None):
        with self.lock:
            self.t[key] = self.t.get(key, 0.0) + dt
            self.n[key] = self.n.get(key, 0) + 1
            if t0 is not None:
                self.spans.setdefault(key, []).append((t0, t1))


ACC = Acc()


def wrap(obj, name, key):
    real = getattr(obj, name)

    def f(*a, **kw):
        t0 = time.perf_counter()
        r = real(*a, **kw)
        t1 = time.perf_counter()
        ACC.add(key, t1 - t0, t0, t1)
        return r

    setattr(obj, name, f)
    return real


def main():
    import jax

    from lzani_tpu.core import native_engine
    from lzani_tpu.io.fasta import load_store
    from lzani_tpu.ops import pallas_engine as pe
    from lzani_tpu.params import Params

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    p = Params()
    p.input_file_names = sorted(
        os.path.join(VIR61, f) for f in os.listdir(VIR61))
    store = load_store(p)
    store.reorder()
    codes = store.codes
    print(f"n={len(codes)}", flush=True)

    # warm run: compiles + program loads
    t0 = time.perf_counter()
    out_w = pe.all2all_pallas(codes, p)
    print(f"cold run {time.perf_counter() - t0:.1f}s", flush=True)
    want = native_engine.all2all(codes, p)
    assert np.array_equal(out_w, want)

    # hook phases
    wrap(pe.PallasAll2All, "build_group_index", "index_build")
    wrap(pe.PallasAll2All, "dispatch_group", "dispatch")
    wrap(pe.PallasAll2All, "collect_group", "collect")
    wrap(native_engine, "replay_events", "replay")
    wrap(native_engine, "parse_pair", "native_parse")

    real_init = pe.PallasAll2All.__init__

    def init_timed(self, *a, **kw):
        t0 = time.perf_counter()
        real_init(self, *a, **kw)
        t1 = time.perf_counter()
        ACC.add("engine_build", t1 - t0, t0, t1)

    pe.PallasAll2All.__init__ = init_timed

    for rep in range(int(os.environ.get("PROF_REPS", "2"))):
        ACC.t.clear(); ACC.n.clear(); ACC.spans.clear()
        t0 = time.perf_counter()
        out = pe.all2all_pallas(codes, p)
        wall = time.perf_counter() - t0
        assert np.array_equal(out, want)

        print(f"\n=== rep {rep}: wall {wall:.3f}s "
              f"({len(codes) * (len(codes) - 1) / wall:.1f} pairs/s) ===")
        for k in sorted(ACC.t, key=lambda k: -ACC.t[k]):
            print(f"  {k:14s} sum {ACC.t[k]:7.3f}s  n={ACC.n[k]:5d}  "
                  f"({100 * ACC.t[k] / wall:5.1f}% of wall)")

        # device-occupancy estimate: a dispatch_group at t marks work
        # entering the device queue; a collect_group span [c0,c1] ending
        # marks a unit's results downloaded. Gap analysis: merge dispatch
        # and collect spans; report wall minus their union coverage.
        disp = ACC.spans.get("dispatch", [])
        coll = ACC.spans.get("collect", [])
        if disp and coll:
            t_first = min(s[0] for s in disp)
            t_last = max(s[1] for s in coll)
            print(f"  first dispatch -> last collect: "
                  f"{t_last - t_first:7.3f}s")
            # time between run start and first dispatch (prep head) and
            # after last collect (replay tail)
            run0 = t0
            print(f"  head (run start -> first dispatch): "
                  f"{t_first - run0:7.3f}s")
            print(f"  tail (last collect -> run end): "
                  f"{run0 + wall - t_last:7.3f}s")
            # collect-side serialization: sum of collect spans vs span
            csum = sum(b - a for a, b in coll)
            print(f"  collect busy: {csum:7.3f}s over {len(coll)} units")


if __name__ == "__main__":
    main()
