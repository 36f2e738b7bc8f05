"""A/B timing harness for kernel experiments: times warm GROUP dispatches
on real vir61 references (the production dispatch unit) and oracle-checks
a sample of the returned event logs, so a kernel edit gets one number
(median group seconds; lower is better) plus an exactness verdict.

Usage: python scripts/ab_kernel.py [label]
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
from lzani_tpu.io.fasta import load_store
from lzani_tpu.params import Params
from lzani_tpu.ops import pallas_engine as pe

VIR61 = "/root/reference/test/vir61"
G = 4


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "base"
    p = Params()
    p.input_file_names = sorted(
        os.path.join(VIR61, f) for f in os.listdir(VIR61))
    store = load_store(p)
    store.reorder()
    codes = store.codes
    dev = jax.devices()[0]
    eng = pe.PallasAll2All(codes, p, devices=[dev])

    groups = [[0, 1, 2, 3], [28, 29, 30, 31]]
    gidxs = [eng.build_group_index(g, dev) for g in groups]

    # warm (compile + program load)
    t0 = time.perf_counter()
    h = eng.dispatch_group(gidxs[0], 0, dev)
    eng.collect_group(h)
    print(f"warm: {time.perf_counter() - t0:.1f}s", flush=True)

    # timed: 8 reps over both groups, lo=0. Min is the robust estimator
    # on this tunnel (host/tunnel interference only ever adds time).
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        hs = [eng.dispatch_group(gi, 0, dev) for gi in gidxs]
        outs = [eng.collect_group(h) for h in hs]
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    mn = float(np.min(ts))

    # exactness: oracle-check a sample of (ref, query) cells
    rng = np.random.RandomState(7)
    fails = 0
    checked = 0
    for gi, g in enumerate(groups):
        out = outs[gi]
        for _ in range(4):
            ri = int(rng.randint(0, len(g)))
            b = int(rng.randint(0, min(eng.B, len(codes))))
            r = g[ri]
            if b == r:
                continue
            ev_k = out[ri][b]
            if ev_k is None:
                continue
            ev_o = ne.parse_event_log(codes[r], codes[b], p)
            checked += 1
            if not np.array_equal(ev_o, ev_k):
                fails += 1
                print(f"MISMATCH r={r} q={b}", flush=True)
    n_pairs = sum(len(g) for g in groups) * min(eng.B, len(codes))
    print(f"[{label}] 2-group wall: min {mn:.3f}s median {med:.3f}s "
          f"({mn / 2:.3f}s/group best, ~{n_pairs / mn:.0f} pairs/s) "
          f"oracle {checked - fails}/{checked} ok", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
