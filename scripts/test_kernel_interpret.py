"""Interpret-mode (CPU) validation of the Pallas event-log kernel against
the native oracle's event log. Run: python scripts/test_kernel_interpret.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops.pallas_engine import PallasRefIndex
from lzani_tpu.params import Params


def diff_events(name, ref, q, p):
    ev_oracle = ne.parse_event_log(ref, q, p)
    idx = PallasRefIndex(ref, p, interpret=True)
    ev_kernel = idx.parse_events(q)
    if np.array_equal(ev_oracle, ev_kernel):
        print(f"{name}: OK ({len(ev_oracle)} events)", flush=True)
        return True
    print(f"{name}: MISMATCH oracle={len(ev_oracle)} kernel={len(ev_kernel)}",
          flush=True)
    n = min(len(ev_oracle), len(ev_kernel))
    for k in range(n):
        if not np.array_equal(ev_oracle[k], ev_kernel[k]):
            print(f"  first diff at event {k}:")
            print(f"    oracle {ev_oracle[k].tolist()}")
            print(f"    kernel {ev_kernel[k].tolist()}")
            for kk in range(max(0, k - 2), k):
                print(f"    (ctx {kk}: {ev_oracle[kk].tolist()})")
            break
    else:
        print(f"  prefix agrees; lengths differ")
        if len(ev_oracle) > n:
            print(f"    oracle extra: {ev_oracle[n].tolist()}")
        if len(ev_kernel) > n:
            print(f"    kernel extra: {ev_kernel[n].tolist()}")
    return False


def main():
    p = Params()
    rng = np.random.RandomState(42)
    ok = True

    # 1: similar pair, moderate mutations
    ref = rng.randint(0, 4, 400).astype(np.uint8)
    q = ref.copy()
    q[::23] = (q[::23] + 1) % 4
    ok &= diff_events("similar-400", ref, q[:380], p)

    # 2: unrelated
    q2 = rng.randint(0, 4, 350).astype(np.uint8)
    ok &= diff_events("unrelated-350", ref, q2, p)

    # 3: heavy mutations (desync/kill paths)
    q3 = ref.copy()
    idx3 = rng.rand(400) < 0.2
    q3[idx3] = (q3[idx3] + rng.randint(1, 4, idx3.sum())) % 4
    ok &= diff_events("heavy-mut", ref, q3, p)

    # 4: with Ns and a deletion
    q4 = ref.copy()
    q4[rng.randint(0, 400, 8)] = 4
    q4 = np.delete(q4, slice(100, 117))
    ok &= diff_events("ns-indel", ref, q4, p)

    # 5: identical (long LCE escalation path)
    ok &= diff_events("identical", ref, ref.copy(), p)

    # 6: reverse complement (rc region matching)
    rc = (3 - ref[::-1]).astype(np.uint8)
    ok &= diff_events("revcomp", ref, rc, p)

    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
