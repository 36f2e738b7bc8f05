"""Randomized interpret-mode stress of the Pallas kernel vs native oracle."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if __name__ == "__main__":
    # CPU-only when run as the stress script; importers (the on-TPU
    # param sweep borrows mutate/rand_params) keep their own platform.
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


def rand_params(rng):
    """Random parameter vector over the same ranges the reference-binary
    differential fuzzer sweeps (mal/msl/mrd/mqd/reg/aw/am/ar)."""
    p = Params()
    p.min_seed_len = int(rng.randint(4, 10))
    p.min_anchor_len = int(rng.randint(p.min_seed_len + 1, 14))
    p.max_dist_in_ref = int(rng.randint(8, 64))
    p.max_dist_in_query = int(rng.randint(8, 64))
    p.min_region_len = int(rng.randint(8, 70))
    p.approx_window = int(rng.randint(4, 28))
    p.approx_mismatches = int(rng.randint(1, p.approx_window + 1))
    p.approx_run_len = int(rng.randint(1, 5))
    return p


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

        pt = rand_params(rng) if t % 3 == 2 else p
        t0 = time.time()
        ev_o = ne.parse_event_log(ref, q, pt)
        idx = PallasRefIndex(ref, pt, interpret=True)
        try:
            ev_k = idx.parse_events(q)
        except AssertionError as e:
            print(f"trial {t}: SKIP ({e})", flush=True)
            continue
        if np.array_equal(ev_o, ev_k):
            st_o, _ = ne.parse_pair(ref, q, pt)
            st_k, _ = ne.replay_events(ref, q, pt, ev_k)
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
    # --- v2 driver (on-device prep) + v4 lockstep over random params ----
    from lzani_tpu.ops.pallas_engine import all2all_pallas

    for t in range(max(N_TRIALS // 4, 3)):
        # each (params, shape, ilv) combo compiles a fresh CPU
        # executable; the unrolled K=16 kernels are large enough
        # that accumulated LLVM JIT modules exhaust vm.max_map_count
        # mid-suite (observed: 'LLVM compilation error: Cannot
        # allocate memory' with 117 GB free). Drop the dead ones.
        import jax as _jax
        _jax.clear_caches()
        pt = rand_params(rng) if t % 2 else Params()
        L = int(rng.randint(260, 900))
        base = rng.randint(0, 4, L).astype(np.uint8)
        codes = [mutate(rng, base, [0.02, 0.1, 0.3][t % 3],
                        n_ns=t % 3, indels=1 + t % 2)
                 for _ in range(4)]
        codes.append(base[: L // 2].copy())
        want = ne.all2all(codes, pt)
        for ilv, sim, tag in (
                (1, False, "v3"), (2, False, "v5k2"), (4, False, "v5k4"),
                (2, True, "v7k2"), (4, True, "v7k4"), (8, True, "v7k8"),
                (16, True, "v7k16")):
            got = all2all_pallas(codes, pt, interpret=True,
                                 ilv=ilv, sim=sim)
            if np.array_equal(got, want):
                print(f"driver trial {t} {tag}: OK", flush=True)
            else:
                fails += 1
                print(f"driver trial {t} {tag}: MISMATCH", flush=True)

    print("FAILURES:" if fails else "ALL OK:", fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
