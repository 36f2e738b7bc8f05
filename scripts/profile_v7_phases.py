"""Phase-doubling profile of the v7 kernel on real vir61 groups.

Each phase tag recomputes one phase with a runtime-zero perturbation
(bit-identical outputs, verified against the base run here); the wall
delta vs base attributes that phase's share of the iteration critical
path. This is the round-4 answer to "what binds at ilv=4->8 now that
the decision tails alternate" (DESIGN.md round 4).

Phases: v7win (alternated S-chain), v7red (per-pair row reductions +
pk extracts), v7ext (fwd+bwd extension first chunks), v7store
(per-event block store), v7anchor (SIMT anchor LCE chunk).

Usage: python scripts/profile_v7_phases.py [ilv]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from lzani_tpu.io.fasta import load_store
from lzani_tpu.params import Params
from lzani_tpu.ops import pallas_engine as pe

VIR61 = "/root/reference/test/vir61"
ILV = int(sys.argv[1]) if len(sys.argv) > 1 else 4
PHASES = ["base", "v7win", "v7red", "v7ext", "v7store", "v7anchor",
          "v7loads", "v7tocol", "v7probe", "v7pkdec", "v7merge"]


def main():
    p = Params()
    p.input_file_names = sorted(
        os.path.join(VIR61, f) for f in os.listdir(VIR61))
    store = load_store(p)
    store.reorder()
    codes = store.codes
    dev = jax.devices()[0]

    groups = [[0, 1, 2, 3], [28, 29, 30, 31]]
    base_out = None
    rows = []
    for ph in PHASES:
        pe.PROF_DOUBLE = (frozenset() if ph == "base"
                          else frozenset({ph}))
        pe._get_group_step.cache_clear()
        eng = pe.PallasAll2All(codes, p, devices=[dev], sim=1, ilv=ILV)
        gidxs = [eng.build_group_index(g, dev) for g in groups]
        t0 = time.perf_counter()
        outs = [eng.collect_group(eng.dispatch_group(gi, 0, dev))
                for gi in gidxs]
        warm_s = time.perf_counter() - t0
        # exactness vs base (event logs must be bit-identical)
        if ph == "base":
            base_out = outs
            ident = True
        else:
            ident = all(
                (a is None and b is None)
                or (a is not None and b is not None and np.array_equal(a, b))
                for go, gb in zip(outs, base_out)
                for ro, rb in zip(go, gb)
                for a, b in zip(ro, rb))
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            hs = [eng.dispatch_group(gi, 0, dev) for gi in gidxs]
            for h in hs:
                eng.collect_group(h)
            ts.append(time.perf_counter() - t0)
        tmin = float(np.min(ts))
        rows.append((ph, tmin, ident, warm_s))
        print(f"{ph:9s} min {tmin:.3f}s  ident={ident}  "
              f"(warm {warm_s:.0f}s)", flush=True)

    base = rows[0][1]
    print("\nphase deltas vs base (share of 2-group wall):")
    for ph, t, ident, _ in rows[1:]:
        print(f"  {ph:9s} +{t - base:+.3f}s  ({(t - base) / base:+.1%})"
              f"{'' if ident else '  NOT IDENTICAL'}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
