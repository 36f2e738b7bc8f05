"""In-kernel phase cost profile on the REAL vir61 workload.

Uses the PROF_DOUBLE hooks in ops/pallas_engine.py: each variant doubles
one phase's computation (perturbed by a runtime zero so Mosaic cannot CSE
it, combined with min so results stay bit-identical), and its cost is the
dispatch-time delta vs the base kernel on the same (ref, batch).

Run on TPU: ~1-2 min Mosaic compile per variant through the tunnel.
"""
import os
import sys
import time

os.environ["LZANI_TPU_AOT"] = "0"   # executables must not cross variants
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from lzani_tpu.io.fasta import load_store
from lzani_tpu.params import Params
from lzani_tpu.ops import pallas_engine as pe

VIR61 = "/root/reference/test/vir61"
PHASES = ["base", "ebuild", "rundet", "diag", "tiepack", "ext", "anchor",
          "seedfix", "reduce", "conds"]
if os.environ.get("PROF_PHASES"):
    PHASES = ["base"] + [p for p in os.environ["PROF_PHASES"].split(",")
                         if p != "base"]
REFS = (0, 30)


def main():
    p = Params()
    p.input_file_names = sorted(
        os.path.join(VIR61, f) for f in os.listdir(VIR61))
    store = load_store(p)
    store.reorder()
    codes = store.codes
    dev = jax.devices()[0]
    eng = pe.PallasAll2All(codes, p, devices=[dev])
    idxs = {r: eng.build_index(r, dev) for r in REFS}

    def run_once(r):
        h = eng.dispatch_range(r, 0, dev, idx=idxs[r])
        return eng.collect(h)

    def t_med(r, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            run_once(r)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    base_ev = {}
    base_t = {}
    rows = []
    for ph in PHASES:
        pe.PROF_DOUBLE = frozenset() if ph == "base" else frozenset({ph})
        pe._get_ref_step.cache_clear()
        t_c0 = time.perf_counter()
        evs = {r: run_once(r) for r in REFS}   # compile + correctness
        compile_s = time.perf_counter() - t_c0
        ts = {r: t_med(r) for r in REFS}
        if ph == "base":
            base_ev = evs
            base_t = ts
            ident = True
        else:
            ident = all(
                (a is None and b is None)
                or (a is not None and b is not None and np.array_equal(a, b))
                for r in REFS
                for a, b in zip(evs[r], base_ev[r]))
        d = {r: (ts[r] - base_t[r]) * 1e3 for r in REFS}
        rows.append((ph, d, ident))
        print(f"{ph:8s}: " + "  ".join(
            f"ref{r} {ts[r]*1e3:7.1f}ms (d {d[r]:+6.1f})" for r in REFS)
            + f"  identical={ident}  (compile {compile_s:.0f}s)",
            flush=True)

    print("\nphase cost share of the base dispatch (ref0 / ref30):")
    for ph, d, _ in rows[1:]:
        print(f"  {ph:8s}: {d[REFS[0]]:+7.1f}ms "
              f"({d[REFS[0]]/ (base_t[REFS[0]]*1e3) *100:5.1f}%) / "
              f"{d[REFS[1]]:+7.1f}ms "
              f"({d[REFS[1]]/ (base_t[REFS[1]]*1e3) *100:5.1f}%)",
              flush=True)


if __name__ == "__main__":
    main()
