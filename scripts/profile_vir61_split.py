"""Split the REAL vir61 per-dispatch cost into prep vs kernel vs RTT.

Strategy: build the production engine on vir61, then time three jits on
the same ref/batch (median of reps, warm):
  full      -- the production _get_ref_step (prep + pallas kernel + pack)
  prep_only -- an identical prep graph that returns reductions of the
               kernel inputs instead of running the kernel
  noop      -- a trivial device op (captures tunnel RTT + dispatch fix)

kernel_cost ~= full - prep_only;  prep_cost ~= prep_only - noop.
Also prints the whole-run warm wall and implied pairs/s for context.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from lzani_tpu.io.fasta import load_store
from lzani_tpu.params import Params
from lzani_tpu.ops import pallas_engine as pe

VIR61 = "/root/reference/test/vir61"


def t_med(f, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    p = Params()
    p.input_file_names = sorted(
        os.path.join(VIR61, f) for f in os.listdir(VIR61))
    store = load_store(p)
    store.reorder()
    codes = store.codes
    dev = jax.devices()[0]
    eng = pe.PallasAll2All(codes, p, devices=[dev])
    print(f"n={len(codes)} B={eng.B} LqP={eng.LqP} LqPrep={eng.LqPrep}",
          flush=True)

    r = 0
    idx = eng.build_index(r, dev)
    cfg = eng.cfg
    print(f"ref0: nr={idx.nr} LrP={idx.LrP} KaP={idx.KaP}", flush=True)

    args = (idx.refbuf_p, eng.Q[dev], np.int32(0), np.int32(idx.nr),
            eng.DSZ[dev], idx.win_flat, idx.cmat)

    with jax.enable_x64(False):
        step = pe._get_ref_step(cfg, idx.LrP, eng.LqP, idx.KaP, idx.WinP,
                                eng.B, eng.CNT_CAP, eng.EV_CAP,
                                False, eng.LqPrep)

        mal, msl = cfg.mal, cfg.msl
        nk = 1 << (2 * mal)
        B, LqP, LrP, KaP = eng.B, eng.LqP, idx.LrP, idx.KaP
        LqPrep = eng.LqPrep

        @jax.jit
        def prep_only(refbuf_p, Qpacked, lo_row, nr_s, dszs_full, win,
                      cmat):
            dsz = jax.lax.dynamic_slice(dszs_full, (lo_row,), (B,))
            refbuf = pe.dev_unpack3(refbuf_p, LrP)
            km = pe.dev_kmer_stream(refbuf, mal)[0]
            pos = jax.lax.broadcasted_iota(jnp.int32, (LrP, 1), 0)[:, 0]
            keys = jnp.where(km >= 0, km, nk)
            _, pos_s = jax.lax.sort((keys, pos), num_keys=1)
            count = jnp.zeros(nk + 1, jnp.int32).at[keys].add(1)
            count = count[:nk]
            start = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(count)[:-1]])
            ptab = jnp.where(count > 0,
                             (start << 7) | jnp.minimum(count, 127), 0)
            Lp = LqPrep or LqP
            Lp3 = min(-(-Lp // 3) + 128, Qpacked.shape[1])
            qsel_p = jax.lax.dynamic_slice(
                Qpacked, (lo_row, 0), (B, Qpacked.shape[1]))
            qsel = pe.dev_unpack3(qsel_p[:, :Lp3], Lp)
            qkm = pe.dev_kmer_stream(qsel, mal)
            qk = jnp.where(qkm >= 0, qkm, 0)
            pk = jnp.where(qkm >= 0, ptab[qk], 0)
            cnt = pk & 127
            overflow = jnp.max(cnt, axis=1) > eng.CNT_CAP
            idxm = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1)
            limit = (dsz - msl)[:, None]
            hit = (cnt > 0) & (idxm < limit)
            nh_src = jnp.where(hit, idxm, dsz[:, None])
            nh = jnp.flip(jax.lax.cummin(jnp.flip(nh_src, 1), axis=1), 1)
            # force materialization of every kernel input
            return (jnp.sum(pk) + jnp.sum(nh) + jnp.sum(qsel)
                    + jnp.sum(pos_s[:KaP]) + jnp.sum(overflow))

        # sub-stages of prep, cumulative
        @jax.jit
        def prep_join(refbuf_p):
            refbuf = pe.dev_unpack3(refbuf_p, LrP)
            km = pe.dev_kmer_stream(refbuf, mal)[0]
            pos = jax.lax.broadcasted_iota(jnp.int32, (LrP, 1), 0)[:, 0]
            keys = jnp.where(km >= 0, km, nk)
            _, pos_s = jax.lax.sort((keys, pos), num_keys=1)
            count = jnp.zeros(nk + 1, jnp.int32).at[keys].add(1)
            count = count[:nk]
            start = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(count)[:-1]])
            ptab = jnp.where(count > 0,
                             (start << 7) | jnp.minimum(count, 127), 0)
            return jnp.sum(ptab) + jnp.sum(pos_s[:KaP])

        @jax.jit
        def prep_qkm(Qpacked, lo_row):
            Lp = LqPrep or LqP
            Lp3 = min(-(-Lp // 3) + 128, Qpacked.shape[1])
            qsel_p = jax.lax.dynamic_slice(
                Qpacked, (lo_row, 0), (B, Qpacked.shape[1]))
            qsel = pe.dev_unpack3(qsel_p[:, :Lp3], Lp)
            qkm = pe.dev_kmer_stream(qsel, mal)
            return jnp.sum(qkm) + jnp.sum(qsel)

        @jax.jit
        def prep_gather(refbuf_p, Qpacked, lo_row):
            # join + query kmers + the ptab gather (everything but cummin)
            refbuf = pe.dev_unpack3(refbuf_p, LrP)
            km = pe.dev_kmer_stream(refbuf, mal)[0]
            pos = jax.lax.broadcasted_iota(jnp.int32, (LrP, 1), 0)[:, 0]
            keys = jnp.where(km >= 0, km, nk)
            _, pos_s = jax.lax.sort((keys, pos), num_keys=1)
            count = jnp.zeros(nk + 1, jnp.int32).at[keys].add(1)
            count = count[:nk]
            start = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(count)[:-1]])
            ptab = jnp.where(count > 0,
                             (start << 7) | jnp.minimum(count, 127), 0)
            Lp = LqPrep or LqP
            Lp3 = min(-(-Lp // 3) + 128, Qpacked.shape[1])
            qsel_p = jax.lax.dynamic_slice(
                Qpacked, (lo_row, 0), (B, Qpacked.shape[1]))
            qsel = pe.dev_unpack3(qsel_p[:, :Lp3], Lp)
            qkm = pe.dev_kmer_stream(qsel, mal)
            qk = jnp.where(qkm >= 0, qkm, 0)
            pk = jnp.where(qkm >= 0, ptab[qk], 0)
            return jnp.sum(pk) + jnp.sum(pos_s[:KaP]) + jnp.sum(qsel)

        @jax.jit
        def noop(x):
            return jnp.sum(x) * 0 + 1

        def runf(f, *a):
            return lambda: int(np.asarray(jax.device_get(f(*a)))
                               .reshape(-1)[0]) | 0

        # warm all
        full = lambda: (lambda h: (np.asarray(h[0][:, :16]),
                                   np.asarray(h[1])))(step(*args))
        full()
        f_prep = runf(prep_only, *args)
        f_join = runf(prep_join, idx.refbuf_p)
        f_qkm = runf(prep_qkm, eng.Q[dev], np.int32(0))
        f_gath = runf(prep_gather, idx.refbuf_p, eng.Q[dev], np.int32(0))
        f_noop = runf(noop, idx.win_flat)
        for f in (f_prep, f_join, f_qkm, f_gath, f_noop):
            f()

        t_full = t_med(full)
        t_prep = t_med(f_prep)
        t_join = t_med(f_join)
        t_qkm = t_med(f_qkm)
        t_gath = t_med(f_gath)
        t_noop = t_med(f_noop)

    print(f"noop (RTT)      : {t_noop*1e3:8.1f} ms", flush=True)
    print(f"join build      : {(t_join-t_noop)*1e3:8.1f} ms", flush=True)
    print(f"query kmers     : {(t_qkm-t_noop)*1e3:8.1f} ms", flush=True)
    print(f"gather (ptab)   : {(t_gath-t_join-t_qkm+t_noop)*1e3:8.1f} ms",
          flush=True)
    print(f"cummin (nh)     : {(t_prep-t_gath)*1e3:8.1f} ms", flush=True)
    print(f"prep total      : {(t_prep-t_noop)*1e3:8.1f} ms "
          f"(gather+cummin ~= {(t_prep-t_join-t_qkm+t_noop)*1e3:.1f})",
          flush=True)
    print(f"full dispatch   : {t_full*1e3:8.1f} ms", flush=True)
    print(f"kernel portion  : {(t_full-t_prep)*1e3:8.1f} ms", flush=True)
    n_pairs = 60
    print(f"per-pair: full={t_full/n_pairs*1e3:.2f} "
          f"kernel={(t_full-t_prep)/n_pairs*1e3:.2f} "
          f"prep={(t_prep-t_noop)/n_pairs*1e3:.2f} "
          f"rtt={t_noop/n_pairs*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
