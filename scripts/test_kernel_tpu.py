"""Compile + validate the Pallas kernel on the real TPU.
Usage: python scripts/test_kernel_tpu.py [L] [trials]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops.pallas_engine import PallasRefIndex
from lzani_tpu.params import Params

L = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def main():
    p = Params()
    rng = np.random.RandomState(11)
    ref = rng.randint(0, 4, L).astype(np.uint8)
    t0 = time.time()
    idx = PallasRefIndex(ref, p, interpret=False)
    print(f"host prep: {time.time()-t0:.1f}s", flush=True)

    fails = 0
    for t in range(TRIALS):
        rate = [0.01, 0.08, 0.25, 0.5][t % 4]
        q = ref.copy()
        m = rng.rand(L) < rate
        q[m] = (q[m] + rng.randint(1, 4, m.sum())) % 4
        q = q[: L - 13 * t]
        t0 = time.time()
        ev_k = idx.parse_events(q)
        dt = time.time() - t0
        ev_o = ne.parse_event_log(ref, q, p)
        if np.array_equal(ev_o, ev_k):
            print(f"trial {t}: OK rate={rate} ev={len(ev_o)} ({dt:.1f}s)",
                  flush=True)
        else:
            fails += 1
            n = min(len(ev_o), len(ev_k))
            k = next((i for i in range(n)
                      if not np.array_equal(ev_o[i], ev_k[i])), n)
            print(f"trial {t}: MISMATCH at ev {k}/{len(ev_o)},{len(ev_k)}: "
                  f"o={ev_o[k].tolist() if k < len(ev_o) else '-'} "
                  f"k={ev_k[k].tolist() if k < len(ev_k) else '-'}",
                  flush=True)
    # warm timing
    q = ref.copy()
    m = rng.rand(L) < 0.05
    q[m] = (q[m] + 1) % 4
    ev = idx.parse_events(q)  # compile for this exact shape set
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        ev = idx.parse_events(q)
    dt = (time.time() - t0) / reps
    print(f"warm single-pair: {dt*1e3:.1f}ms  ({len(ev)} events)",
          flush=True)
    print("FAILURES:" if fails else "ALL OK:", fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
