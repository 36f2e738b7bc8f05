"""Interpret-mode (CPU) validation of the v5 latency-interleaved kernel:
dispatch_group event streams at ilv = 2/4 must equal the native oracle
and the ilv = 1 (v3) group path on mixed synthetic families.

Run: python scripts/test_v5_interpret.py [ilvs...]
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops.pallas_engine import PallasAll2All
from lzani_tpu.params import Params


def synth(rng, n=10):
    """Mixed family: related (substitutions + indels + cuts), unrelated,
    short, N-runs — the stress mix of scripts/stress_kernel_interpret.py."""
    base = rng.randint(0, 4, 3000).astype(np.uint8)
    codes = []
    for k in range(n):
        kind = k % 5
        if kind == 0:
            c = base.copy()
        elif kind == 1:
            c = base.copy()
            m = rng.rand(len(c)) < rng.uniform(0.01, 0.1)
            c[m] = (c[m] + rng.randint(1, 4, m.sum())) % 4
        elif kind == 2:
            c = base.copy()
            for _ in range(6):
                p = rng.randint(0, len(c) - 60)
                if rng.rand() < 0.5:
                    c = np.concatenate([c[:p], c[p + rng.randint(1, 50):]])
                else:
                    ins = rng.randint(0, 4, rng.randint(1, 50)
                                      ).astype(np.uint8)
                    c = np.concatenate([c[:p], ins, c[p:]])
        elif kind == 3:
            c = rng.randint(0, 4, rng.randint(300, 2500)).astype(np.uint8)
        else:
            c = base[rng.randint(0, 1500):].copy()
            c[rng.randint(0, len(c), 30)] = 4  # N runs
        codes.append(np.ascontiguousarray(c))
    return codes


def group_events(eng, codes, r_list):
    gi = eng.build_group_index(r_list, eng.devices[0])
    out = {}
    for lo in range(0, eng.n_pad, eng.B):
        evs = eng.collect_group(eng.dispatch_group(gi, lo, eng.devices[0]))
        for g, r in enumerate(r_list):
            if r < 0:
                continue
            for b in range(eng.B):
                q = lo + b
                if q < len(codes) and q != r:
                    out[(r, q)] = evs[g][b]
    return out


def main():
    ilvs = [int(a) for a in sys.argv[1:]] or [2, 4]
    p = Params()
    rng = np.random.RandomState(7)
    codes = synth(rng)
    n = len(codes)

    base_eng = PallasAll2All(codes, p, interpret=True, ilv=1)
    r_lists = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, -1, -1]]
    base = {}
    for rl in r_lists:
        base.update(group_events(base_eng, codes, rl))

    # oracle check of the v3 group baseline itself
    bad = 0
    for (r, q), ev in sorted(base.items()):
        oracle = ne.parse_event_log(codes[r], codes[q], p)
        got = ev if ev is not None else None
        if got is None or not np.array_equal(oracle, got):
            print(f"v3 group vs oracle MISMATCH at r={r} q={q}")
            bad += 1
    print(f"v3 group path vs oracle: {len(base) - bad}/{len(base)} OK",
          flush=True)

    for ilv in ilvs:
        eng = PallasAll2All(codes, p, interpret=True, ilv=ilv)
        got = {}
        for rl in r_lists:
            got.update(group_events(eng, codes, rl))
        mism = [kq for kq in base
                if not ((base[kq] is None and got[kq] is None)
                        or (base[kq] is not None and got[kq] is not None
                            and np.array_equal(base[kq], got[kq])))]
        if mism:
            r, q = mism[0]
            print(f"ilv={ilv}: {len(mism)} MISMATCHES, first r={r} q={q}")
            a, b = base[(r, q)], got[(r, q)]
            if a is not None and b is not None:
                for k in range(min(len(a), len(b))):
                    if not np.array_equal(a[k], b[k]):
                        print(f"  first diff event {k}: v3={a[k].tolist()}"
                              f" v5={b[k].tolist()}")
                        break
                else:
                    print(f"  lengths differ: v3={len(a)} v5={len(b)}")
            else:
                print(f"  one side None: v3={a is not None} "
                      f"v5={b is not None}")
            return 1
        print(f"ilv={ilv}: all {len(base)} pairs byte-identical to v3",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
