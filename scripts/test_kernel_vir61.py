"""Validate + time the Pallas kernel on real vir61 pairs (TPU).
Usage: python scripts/test_kernel_vir61.py [n_pairs]
"""
import glob
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception as e:
    print("cache config:", e, flush=True)

from lzani_tpu.core import native_engine as ne
from lzani_tpu.io.fasta import load_store
from lzani_tpu.ops.pallas_engine import PallasRefIndex
from lzani_tpu.params import Params

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def main():
    p = Params()
    p.input_file_names = sorted(glob.glob("/root/reference/test/vir61/*.fna"))
    store = load_store(p)
    store.reorder()
    codes = store.codes

    rng = np.random.RandomState(5)
    r = 30
    idx = PallasRefIndex(codes[r], p)
    fails = 0
    times = []
    evs = []
    for t in range(N):
        q = int(rng.randint(0, len(codes)))
        if q == r:
            continue
        t0 = time.time()
        ev_k = idx.parse_events(codes[q])
        dt = time.time() - t0
        ev_o = ne.parse_event_log(codes[r], codes[q], p)
        ok = np.array_equal(ev_o, ev_k)
        print(f"pair {r}x{q}: {'OK' if ok else 'MISMATCH'} "
              f"ev={len(ev_o)}/{len(ev_k)} ({dt:.1f}s)", flush=True)
        if not ok:
            fails += 1
            n = min(len(ev_o), len(ev_k))
            k = next((i for i in range(n)
                      if not np.array_equal(ev_o[i], ev_k[i])), n)
            print(f"  at ev {k}: o={ev_o[k].tolist() if k < len(ev_o) else '-'}"
                  f" k={ev_k[k].tolist() if k < len(ev_k) else '-'}",
                  flush=True)
        else:
            times.append(dt)
            evs.append(len(ev_o))
    if times:
        warm = times[1:] or times
        print(f"median warm: {np.median(warm)*1e3:.0f}ms/pair, "
              f"events mean {np.mean(evs):.0f}", flush=True)
    print("FAILURES:" if fails else "ALL OK:", fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
