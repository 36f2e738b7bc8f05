"""Randomized interpret-mode stress of the v7 kernel at MINIMAL window
geometry: for each random parameter set the window is compiled at
WR = ceil8(D + msl_eff) — the legality floor — so every edge-cap
escalation path (contest_one on row-capped cells) is exercised far more
often than at the production margin. Events must equal the native
oracle bitwise (reference semantics: parser.cpp:482-716).

Usage: python scripts/stress_v7_geometry.py [n_trials] [seed]
"""
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from lzani_tpu.core import native_engine as ne
from lzani_tpu.params import Params
from stress_kernel_interpret import mutate, rand_params

N_TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 0


def min_wr(p):
    D = p.max_dist_in_query + 1
    msl_eff = min(p.min_seed_len, 32)
    return -(-(D + msl_eff) // 8) * 8


def min_wc(p):
    D = p.max_dist_in_query + 1
    W = p.max_dist_in_query + p.max_dist_in_ref
    msl_eff = min(p.min_seed_len, 32)
    return -(-(W + D + msl_eff) // 128) * 128


def main():
    from lzani_tpu.ops.pallas_engine import all2all_pallas

    rng = np.random.RandomState(SEED)
    fails = 0
    for t in range(N_TRIALS):
        pt = rand_params(rng) if t % 2 else Params()
        wr = min_wr(pt)
        wc = min_wc(pt)
        os.environ["LZANI_TPU_WROWS"] = str(wr)
        os.environ["LZANI_TPU_WCOLS"] = str(wc)
        L = int(rng.randint(300, 1100))
        if t % 4 == 0:  # tandem repeats: long runs all over the window
            unit = rng.randint(0, 4, rng.randint(15, 60)).astype(np.uint8)
            base = np.tile(unit, L // len(unit) + 1)[:L]
        else:
            base = rng.randint(0, 4, L).astype(np.uint8)
        codes = [mutate(rng, base, [0.01, 0.05, 0.15, 0.3][t % 4],
                        n_ns=t % 3, indels=t % 3) for _ in range(4)]
        codes.append(base[: L // 2].copy())
        want = ne.all2all(codes, pt)
        for ilv in (2, 4):
            got = all2all_pallas(codes, pt, interpret=True,
                                 ilv=ilv, sim=True)
            ok = np.array_equal(got, want)
            print(f"trial {t} wr={wr} wc={wc} ilv={ilv} "
                  f"mqd={pt.max_dist_in_query} msl={pt.min_seed_len}: "
                  f"{'OK' if ok else 'MISMATCH'}", flush=True)
            if not ok:
                fails += 1
    os.environ.pop("LZANI_TPU_WROWS", None)
    os.environ.pop("LZANI_TPU_WCOLS", None)
    print("FAILS:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
