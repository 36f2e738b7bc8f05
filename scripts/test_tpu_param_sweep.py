"""On-TPU randomized-parameter byte-exactness sweep (VERDICT r2 item 7).

The interpret-mode stress suite (scripts/stress_kernel_interpret.py)
covers random parameter vectors on CPU; real-TPU validation previously
covered default params only (vir61, ab_dissimilar). This runs a trimmed
random param-vector sweep on the real device and asserts byte-equality
of the full all2all triple table vs the native oracle — the analog of
the reference CI's cross-platform `cmp` (.github/workflows/main.yml).

Each distinct param vector compiles a fresh kernel program (~1-4 min
through this tunnel), so the sweep is deliberately small: N_CASES
vectors over one fixed genome set (similar + mutated + indels + Ns +
unrelated + tandem-repeat + a half-length cut) inside a single shape
bucket. Kernel variant = the shipping auto default (honors
LZANI_TPU_SIM / LZANI_TPU_ILV for A/B).

Usage: python scripts/test_tpu_param_sweep.py [n_cases] [seed]
Writes one summary JSON line; exits nonzero on any mismatch.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.environ.get("SWEEP_INTERPRET") == "1":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops.pallas_engine import all2all_pallas
from stress_kernel_interpret import mutate, rand_params

N_CASES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 3
# SWEEP_INTERPRET=1: run the same sweep in interpret mode (CPU logic
# check of the harness itself; the real record is the device run)
INTERPRET = os.environ.get("SWEEP_INTERPRET") == "1"


def genome_set(rng):
    """One fixed set exercising every kernel path: close pairs (event
    chains), heavy mutation + indels (desync / re-anchor), Ns (masking),
    unrelated (pure desync), tandem repeats (candidate-list pressure +
    capped-cell contests), and a prefix cut (length asymmetry)."""
    L = 2200
    base = rng.randint(0, 4, L).astype(np.uint8)
    unit = rng.randint(0, 4, 37).astype(np.uint8)
    tandem = np.tile(unit, L // len(unit) + 1)[:L].astype(np.uint8)
    return [
        base,
        mutate(rng, base, 0.02, n_ns=0, indels=1),
        mutate(rng, base, 0.12, n_ns=3, indels=2),
        mutate(rng, base, 0.30, n_ns=1, indels=3),
        rng.randint(0, 4, L - 150).astype(np.uint8),
        tandem,
        mutate(rng, tandem, 0.05, n_ns=0, indels=1),
        base[: L // 2].copy(),
    ]


def main():
    rng = np.random.RandomState(SEED)
    codes = sorted(genome_set(rng), key=len, reverse=True)
    fails = []
    times = []
    for t in range(N_CASES):
        p = rand_params(rng)
        pv = (p.min_anchor_len, p.min_seed_len, p.max_dist_in_ref,
              p.max_dist_in_query, p.min_region_len, p.approx_window,
              p.approx_mismatches, p.approx_run_len)
        want = ne.all2all(codes, p)
        t0 = time.perf_counter()
        got = all2all_pallas(codes, p, interpret=INTERPRET)
        dt = time.perf_counter() - t0
        ok = np.array_equal(got, want)
        times.append(dt)
        print(f"case {t}: params(mal,msl,mrd,mqd,reg,aw,am,ar)={pv} "
              f"{'OK' if ok else 'MISMATCH'} ({dt:.0f}s)", flush=True)
        if not ok:
            fails.append(pv)
    print(json.dumps({
        "sweep": "tpu_param_random", "cases": N_CASES, "seed": SEED,
        "genomes": len(codes), "fails": len(fails),
        "fail_params": fails, "total_s": round(sum(times), 1),
        "backend": jax.devices()[0].platform,
        "sim": os.environ.get("LZANI_TPU_SIM", "auto"),
        "ilv": os.environ.get("LZANI_TPU_ILV", "auto")}), flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
