"""Decompose the v3 kernel's per-pair cost into phase costs by running
bucket-matched constructed pairs that isolate the code paths:

  similar   -- vir61-like mutated pair (the production mix)
  identical -- one anchor event + one giant forward extension
  random    -- unrelated genomes (desync/anchor-miss path dominates)
  periodic  -- high seed density (escalation/tie-break heavy)

The genome list is padded with 100 bp dummies to the production batch
shape (B=64) and sized to the production vir61 buckets, so after a vir61
warm-up this compiles nothing new. Each configuration is measured
DIFFERENTIALLY: dispatch with the probe query present minus dispatch with
it replaced by a dummy. The kernel's profiling counters (synced
supersteps / desync steps, event-buffer tail lanes 0/1) give the linear
system  wall ~= a*n_sync + b*n_desync + c*n_events + const.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

if os.environ.get("PROF_CPU"):  # interpret-mode smoke test (tiny L)
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax  # noqa: E402

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops import pallas_engine as pe
from lzani_tpu.ops.pallas_engine import PallasAll2All, PallasRefIndex
from lzani_tpu.params import Params

# the superstep/desync counters are compile-time optional (production
# kernels drop them from the loop state); this script needs them
pe.PROF_COUNTERS = True
pe._get_ref_step.cache_clear()
pe._get_group_step.cache_clear()

L = int(os.environ.get("PROF_L", 39_000))  # vir61-typical -> same buckets
INTERP = bool(os.environ.get("PROF_CPU"))
EvL = PallasRefIndex.MAXEV * 8


def timed_dispatch(eng, n_rep=3):
    ts = []
    h = None
    for _ in range(n_rep):
        t0 = time.perf_counter()
        h = eng.dispatch_range(0, 0)
        eng.collect(h)
        ts.append(time.perf_counter() - t0)
    return min(ts), h


def counters(handle, row, packed):
    ev, nev, ovf = handle
    arr = np.asarray(ev[row:row + 1])[0]
    r0 = (EvL - 128) // 8
    if packed:
        u = arr.view(np.uint32)
        return int(u[r0 * 3] & 0xFFFF), int(u[r0 * 3 + 1])
    return int(arr[EvL - 128]), int(arr[EvL - 127])


def main():
    rng = np.random.RandomState(11)
    p = Params()
    base = rng.randint(0, 4, L).astype(np.uint8)

    def mut(rate, seed):
        """Substitutions at `rate` plus indels (1-8 bp every ~300 bp) --
        indels break the approximate extension and force new events, like
        real genome pairs do (pure substitutions at <am/aw density never
        stop the extension scan)."""
        r2 = np.random.RandomState(seed)
        s = base.copy()
        m = r2.rand(L) < rate
        s[m] = (s[m] + r2.randint(1, 4, m.sum())) % 4
        out = []
        pos = 0
        while pos < L:
            seg = int(r2.randint(150, 450))
            out.append(s[pos:pos + seg])
            pos += seg
            if r2.rand() < 0.5:  # insertion
                out.append(r2.randint(0, 4, int(r2.randint(1, 9)))
                           .astype(np.uint8))
            else:  # deletion
                pos += int(r2.randint(1, 9))
        return np.concatenate(out)[:L]

    rnd = rng.randint(0, 4, L).astype(np.uint8)
    unit = rng.randint(0, 4, 231).astype(np.uint8)
    pbase = np.tile(unit, L // 231 + 1)[:L].copy()
    per = pbase.copy()
    per[::97] = (per[::97] + 1) % 4
    probes = {"sim1": (base, mut(0.01, 1)), "sim4": (base, mut(0.04, 2)),
              "sim10": (base, mut(0.10, 3)),
              "identical": (base, base.copy()),
              "random": (base, rnd), "periodic": (pbase, per)}

    dummies = [rng.randint(0, 4, 100).astype(np.uint8) for _ in range(62)]

    rows = []
    for name, (ref, q) in probes.items():
        codes_bg = [ref, rng.randint(0, 4, 100).astype(np.uint8)] + dummies
        codes_fg = [ref, q] + dummies
        eng_bg = PallasAll2All(codes_bg, p, devices=jax.devices()[:1],
                               interpret=INTERP)
        eng_fg = PallasAll2All(codes_fg, p, devices=jax.devices()[:1],
                               interpret=INTERP)
        t_bg, _ = timed_dispatch(eng_bg)
        t_fg, h = timed_dispatch(eng_fg)
        dt = t_fg - t_bg
        evs = eng_fg.collect(h)
        ev_o = ne.parse_event_log(ref, q, p)
        ok = evs[1] is not None and np.array_equal(ev_o, evs[1])
        n_ss, n_ds = counters(h, 1, eng_fg.packed_ev)
        n_ev = len(ev_o)
        # extension-scan chunk estimate: 1 fwd call per event + extra
        # 128-lane chunks for long extensions + bwd chunks
        n_ch = int(n_ev + np.ceil(ev_o[:, 4] / 128).sum()
                   + np.ceil(ev_o[:, 3] / 128).sum()) if n_ev else 0
        rows.append((name, dt, n_ss, n_ds, n_ev, n_ch, ok))
        print(f"{name:10s}: {dt*1e3:7.1f}ms (bg {t_bg*1e3:6.1f} fg "
              f"{t_fg*1e3:6.1f})  n_ss={n_ss:6d} n_ds={n_ds:6d} "
              f"n_ev={n_ev:5d} n_ch={n_ch:5d}  exact={ok}", flush=True)

    A = np.array([[r[2], r[3], r[4], r[5], 1.0] for r in rows])
    y = np.array([r[1] for r in rows])
    try:
        x, *_ = np.linalg.lstsq(A, y, rcond=None)
        resid = A @ x - y
        print(f"fit: sync={x[0]*1e6:.2f}us desync={x[1]*1e6:.2f}us "
              f"event={x[2]*1e6:.2f}us chunk={x[3]*1e6:.2f}us "
              f"const={x[4]*1e3:.1f}ms resid={np.abs(resid).max()*1e3:.1f}ms",
              flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    main()
