"""Randomized interpret-mode stress of the Pallas kernel vs native oracle."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops.pallas_engine import PallasRefIndex
from lzani_tpu.params import Params

N_TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 0


def mutate(rng, ref, rate, n_ns, indels):
    q = ref.copy()
    idx = rng.rand(len(q)) < rate
    q[idx] = (q[idx] + rng.randint(1, 4, idx.sum())) % 4
    if n_ns:
        q[rng.randint(0, len(q), n_ns)] = 4
    for _ in range(indels):
        k = rng.randint(0, len(q) - 30)
        if rng.rand() < 0.5:
            q = np.delete(q, slice(k, k + rng.randint(1, 25)))
        else:
            ins = rng.randint(0, 4, rng.randint(1, 25)).astype(np.uint8)
            q = np.concatenate([q[:k], ins, q[k:]])
    return q


def main():
    p = Params()
    rng = np.random.RandomState(SEED)
    fails = 0
    for t in range(N_TRIALS):
        L = int(rng.randint(250, 1600))
        style = t % 5
        if style == 0:       # tandem repeats (arbitration / escalation)
            unit = rng.randint(0, 4, rng.randint(20, 90)).astype(np.uint8)
            ref = np.tile(unit, L // len(unit) + 1)[:L]
        else:
            ref = rng.randint(0, 4, L).astype(np.uint8)
        rate = [0.0, 0.02, 0.08, 0.18, 0.35][t % 5]
        q = mutate(rng, ref, rate, n_ns=t % 4, indels=t % 3)
        if style == 2:       # splice in unrelated middle (desync paths)
            mid = rng.randint(0, 4, L // 3).astype(np.uint8)
            q = np.concatenate([q[: L // 3], mid, q[-L // 3:]])

        t0 = time.time()
        ev_o = ne.parse_event_log(ref, q, p)
        idx = PallasRefIndex(ref, p, interpret=True)
        try:
            ev_k = idx.parse_events(q)
        except AssertionError as e:
            print(f"trial {t}: SKIP ({e})", flush=True)
            continue
        if np.array_equal(ev_o, ev_k):
            st_o, _ = ne.parse_pair(ref, q, p)
            st_k, _ = ne.replay_events(ref, q, p, ev_k)
            okst = st_o == st_k
            print(f"trial {t}: OK L={L} rate={rate} ev={len(ev_o)} "
                  f"stats={'OK' if okst else 'BAD'} ({time.time()-t0:.1f}s)",
                  flush=True)
            if not okst:
                fails += 1
        else:
            fails += 1
            n = min(len(ev_o), len(ev_k))
            k = next((i for i in range(n)
                      if not np.array_equal(ev_o[i], ev_k[i])), n)
            print(f"trial {t}: MISMATCH L={L} rate={rate} at ev {k}: "
                  f"oracle={ev_o[k].tolist() if k < len(ev_o) else '-'} "
                  f"kernel={ev_k[k].tolist() if k < len(ev_k) else '-'}",
                  flush=True)
    print("FAILURES:" if fails else "ALL OK:", fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
