"""v4 event-log kernel: K-pair lockstep interleaving.

The v3 kernel (ops/pallas_engine.py) runs one query per grid step.  v4
packs K queries into ONE kernel program advancing in lockstep
macro-steps: each macro-iteration advances every active pair by one
v3-superstep, with the band phases (seed pre-test, capped diag-LCE,
tie-break pack) batched across the K pairs.  Per-pair control flow stays
exact (each pair's automaton is v3's, branch for branch).

MEASURED RESULT (round 2, full vir61 warm): K=8 = 143 pairs/s vs 230 for
v3 — the stacked (K*80, 256) int32 band is element-bound, so batching
only amortizes minority fixed costs while adding lockstep skew and an
always-on LCE.  The module stays as the maintained, oracle-exact
scaffold for a bit-packed band (K pairs sharing one (80,128) bit tile),
the identified way the stack stops being element-bound; see
ops/DESIGN.md round-2 notes before investing here.

Exactness contract: identical event streams to the v3 kernel / native
oracle (tests/test_pallas_v4.py); the emission machinery downstream
(lza_replay_finalize) is unchanged.

Reference semantics mirrored (via v3): parser.cpp:482-716; see
ops/pallas_engine.py for the per-construct citations.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .anchor_tables import SAT
from .parse import ParseCfg
from .pallas_engine import (BIG, CAP, CH, QROWS, RCOLS, I32,
                            build_const_mat, lane_iota)

__all__ = ["make_parse_kernel_k"]


# ---------------------------------------------------------------------------
# row-indexed vector helpers (the v3 helpers fixed to row 0; v4 blocks are
# (K, L) so every load names its pair row)
# ---------------------------------------------------------------------------

def align_load_r(ref, row, p, n):
    """(1, n) slice of row `row` at dynamic offset p >= 0; n mult of 128."""
    base = (p // 128) * 128
    rem = p - base
    m = n + 128
    blk = ref[row:row + 1, pl.ds(pl.multiple_of(base, 128), m)]
    return pltpu.roll(blk, m - rem, 1)[0:1, :n]


def vext_r(ref, row, p):
    """Scalar ref[row, p] for dynamic p (aligned load + roll)."""
    base = (p // 128) * 128
    rem = p - base
    blk = ref[row:row + 1, pl.ds(pl.multiple_of(base, 128), 128)]
    return pltpu.roll(blk, 128 - rem, 1)[0, 0]


def _to_col(vrow, eye):
    out = jax.lax.dot_general(eye, vrow.astype(jnp.float32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(I32)


def _reverse_lanes(vrow, anti):
    out = jax.lax.dot_general(vrow.astype(jnp.float32), anti,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(I32)


# ---------------------------------------------------------------------------
# kernel factory
# ---------------------------------------------------------------------------

def _dshift_blk(M, step, rloc, ci):
    """Diagonal shift with PAIR-BLOCK edge masks: out[r, c] =
    M[r+step, c+step] where the shift stays inside the pair's QROWS-row
    block (rloc = r % QROWS). Matches v3's matrix-edge mask semantics per
    pair exactly."""
    R, C = M.shape
    M2 = pltpu.roll(pltpu.roll(M, R - step, 0), C - step, 1)
    return jnp.where((rloc < QROWS - step) & (ci < C - step), M2, 0)


def _run_detect_blk(E, m, rloc, ci):
    A = E
    P = 1
    while P * 2 <= m:
        A = A * _dshift_blk(A, P, rloc, ci)
        P *= 2
    if m > P:
        A = A * _dshift_blk(A, m - P, rloc, ci)
    return A


def _diag_lce_blk(E, cap, rloc, ci):
    S = E
    step = 1
    while step < cap:
        R, C = E.shape
        M2 = pltpu.roll(pltpu.roll(S, R - step, 0), C - step, 1)
        take = (S == step) & (rloc < QROWS - step) & (ci < C - step)
        S = S + jnp.where(take, M2, 0)
        step *= 2
    return S


def make_parse_kernel_k(cfg: ParseCfg, LrP: int, LqP: int, KaP: int,
                        WinP: int, EvL: int, K: int):
    """K-pair lockstep kernel with batched band phases.

    Per macro-iteration: phase A builds each active synced pair's band
    inputs (E / geo / dist, per-pair loads) into stacked (K*QROWS, RCOLS)
    scratch; phase B runs ONE seed pre-test + capped diag-LCE + tie-break
    packing over the whole stack (per-op overhead amortized across K
    pairs, pair-block edge masks replicating v3's per-matrix masks);
    phase C resolves events per pair (spurious walk, escalation, anchor
    probes, WIN arbitration, extensions) exactly as v3.

    Blocks: scal (K,128) SMEM; qbuf/cand/nh (K,LqP) VMEM; shared
    refbuf/poslist/win/cmat; out ev (K,EvL), nev (K,1)."""
    MAXEV = EvL // 128 * 16
    mal, msl, mrd, mqd = cfg.mal, cfg.msl, cfg.mrd, cfg.mqd
    reg, aw, am, ar = cfg.reg, cfg.aw, cfg.am, cfg.ar
    D = mqd + 1
    W = mqd + mrd
    NL = mqd + 1
    NS = SAT - msl + 1
    RS = K * QROWS
    assert D - 1 + CAP <= QROWS
    assert W - 1 + CAP <= RCOLS - 50

    def kernel(scal_ref, refbuf, qbuf, poslist, cand, next_hit, win, cmat,
               ev_out, nev_out, EALL, GEOALL, DISTALL, SALL, PCK):

        nr = scal_ref[0, 1]

        # ---------------- per-pair primitives (row k) ----------------------

        def exact_lce(k, qs, rs, cap):
            def body(st):
                off, _ = st
                qb = align_load_r(qbuf, k, qs + off, CH)
                rb = align_load_r(refbuf, 0, rs + off, CH)
                neq = (qb != rb).astype(I32)
                fm = jnp.min(jnp.where(neq > 0, lane_iota(CH), CH))
                return off + CH, fm

            def cond(st):
                off, fm = st
                return (fm == CH) & (off < cap)

            off, fm = body((jnp.int32(0), jnp.int32(CH)))
            off, fm = jax.lax.while_loop(cond, lambda st: body(st),
                                         (off, fm))
            return jnp.minimum(off - CH + fm, cap)

        def ext_scan(k, dpos, rpos, cap, max_len, forward):
            total = jnp.minimum(cap, max_len)
            CE = 128

            def load_miss(base):
                if forward:
                    qb = align_load_r(qbuf, k, dpos + base, CE)
                    rb = align_load_r(refbuf, 0, rpos + base, CE)
                    return (qb != rb).astype(I32)
                sq = dpos - base - CE
                sr = rpos - base - CE
                sh = jnp.maximum(jnp.maximum(-sq, -sr), 0)
                qb = align_load_r(qbuf, k, sq + sh, CE)
                rb = align_load_r(refbuf, 0, sr + sh, CE)
                m0 = (qb != rb).astype(I32)
                mr = _reverse_lanes(m0, cmat[:, 128:256])
                return pltpu.roll(mr, CE - sh, 1)

            def body(st):
                base, run0, tail, last_v, done = st
                nv = jnp.minimum(total - base, CE)
                miss = load_miss(base)
                io = lane_iota(CE)
                valid = io < nv
                m_eff = jnp.where(valid, miss, 0)
                W2 = jax.lax.dot_general(
                    m_eff.astype(jnp.float32), cmat[:, 256:512],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(I32)
                bad_w = W2[:, 0:128]
                runm = W2[:, 128:256]
                sufs = tail
                for stp in (1, 2, 4, 8):
                    sufs = sufs + jnp.where(io < CE - stp,
                                            pltpu.roll(sufs, CE - stp, 1),
                                            0)
                bad = bad_w + jnp.where(io <= aw - 2, sufs, 0)
                stop = valid & (bad > am)
                fs = jnp.min(jnp.where(stop, io, CE), axis=1,
                             keepdims=True)
                extra = jnp.maximum((ar - 1 - run0) - io, 0)
                ok = (valid & (m_eff == 0) & ((runm + extra) == 0)
                      & (io < fs))
                last_v = jnp.maximum(last_v,
                                     jnp.where(ok, base + io + 1, 0))
                key = (jnp.where(stop, 1 << 20, 0)
                       + jnp.where(m_eff > 0, io + 256, 0))
                r2 = jnp.max(key)
                stopped = r2 >= (1 << 20)
                lm_key = r2 & ((1 << 20) - 1)
                run_end = jnp.where(
                    lm_key > 0,
                    jnp.minimum(nv - 1 - (lm_key - 256), ar),
                    jnp.minimum(run0 + nv, ar))
                done = stopped | (nv < CE)
                ntail = pltpu.roll(m_eff, aw - 1, 1)
                ntail = jnp.where(io <= aw - 2, ntail, 0)
                return base + CE, run_end, ntail, last_v, done

            init = (jnp.int32(0), jnp.int32(ar), jnp.zeros((1, CE), I32),
                    jnp.zeros((1, CE), I32), jnp.bool_(False))

            def cond(st):
                base, _, _, _, done = st
                return (~done) & (base < total)

            _, _, _, last_v, _ = jax.lax.while_loop(cond, body, init)
            return jnp.max(last_v)

        def resolve_anchor(k, dsz, jpos):
            pk = vext_r(cand, k, jpos)
            lo = pk >> 7
            cnt = pk & 127

            def run(_):
                pvec = align_load_r(poslist, 0, lo, 128)

                def body(c, st):
                    blen, bpos = st
                    pc = pltpu.roll(pvec, 128 - c, 1)[0, 0]
                    ml = exact_lce(k, jpos, pc,
                                   jnp.minimum(nr - pc, dsz - jpos))
                    take = ml > blen
                    return (jnp.where(take, ml, blen),
                            jnp.where(take, pc, bpos))

                return jax.lax.fori_loop(0, cnt, body,
                                         (jnp.int32(0), jnp.int32(0)))

            return jax.lax.cond(cnt > 0, run,
                                lambda _: (jnp.int32(0), jnp.int32(0)),
                                None)

        def log_event(k, st, i_ev, bpos, blen, bwd, ext):
            ne, pend = st
            lane0 = (ne % 16) * 8
            io = lane_iota(128)
            rec = jnp.where(io == lane0, i_ev,
                  jnp.where(io == lane0 + 1, bpos,
                  jnp.where(io == lane0 + 2, blen,
                  jnp.where(io == lane0 + 3, bwd,
                  jnp.where(io == lane0 + 4, ext, 0)))))
            pend = jnp.where((io >= lane0) & (io < lane0 + 8), rec, pend)
            ne = ne + 1

            def flush(pend):
                blk = (ne // 16) - 1
                ev_out[k:k + 1,
                       pl.ds(pl.multiple_of(blk * 128, 128), 128)] = pend
                return jnp.zeros((1, 128), I32)

            pend = jax.lax.cond(ne % 16 == 0, flush, lambda p: p, pend)
            return ne, pend

        # ---------------- per-pair superstep (v3 step, row k) ---------------

        def apply_match(k, dsz, state, i_ev, bpos, blen):
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, n_ss, n_ds) = state
            lit_ev = lit_run + (i_ev - i)
            pred_ev = pred + (i_ev - i)
            close = (pred_ev >= 0) & (jnp.abs(bpos - pred_ev) <= mrd)

            def close_branch(_):
                return (reg_lo, reg_hi, jnp.int32(0), lit_below,
                        jnp.int32(0))

            def distant_branch(_):
                tl = jnp.where(lit_ev > 0, lit_ev, top_lit)
                do_kill = (reg_lo >= 0) & (reg_hi - reg_lo < reg)
                run_len = (i_ev - reg_lo) + lit_below
                tl = jnp.where(do_kill, run_len, tl)
                bwd = jax.lax.cond(
                    tl > 0,
                    lambda _: ext_scan(k, i_ev, bpos,
                                       jnp.minimum(i_ev, bpos), tl,
                                       forward=False),
                    lambda _: jnp.int32(0), None)
                use_bwd = bwd > 0
                rl = jnp.where(use_bwd, i_ev - bwd, i_ev)
                lb = jnp.where(use_bwd, tl - bwd, tl)
                return (rl, reg_hi, jnp.int32(0), lb, bwd)

            reg_lo2, reg_hi2, top_lit2, lit_below2, bwd = jax.lax.cond(
                close, close_branch, distant_branch, None)

            i2 = i_ev + blen
            pred2 = bpos + blen
            ext = ext_scan(k, i2, pred2,
                           jnp.minimum(dsz - i2, nr - pred2), BIG,
                           forward=True)
            ne2, pend2 = log_event(k, (ne, pend), i_ev, bpos, blen, bwd,
                                   ext)
            i3 = i2 + ext
            pred3 = pred2 + ext
            return (i3, pred3, jnp.int32(0), reg_lo2, i3, top_lit2,
                    lit_below2, ne2, pend2, n_ss, n_ds)

        def desync_step(k, dsz, state):
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, n_ss, n_ds) = state
            n_ds = n_ds + 1
            j = vext_r(next_hit, k, i)

            def to_end(_):
                delta = (dsz - msl) - i
                return (i + delta, pred + delta, lit_run + delta, reg_lo,
                        reg_hi, top_lit, lit_below, ne, pend, n_ss, n_ds)

            def at_candidate(_):
                a_len, a_pos = resolve_anchor(k, dsz, j)
                st2 = (i, pred, lit_run, reg_lo, reg_hi, top_lit,
                       lit_below, ne, pend, n_ss, n_ds)
                return apply_match(k, dsz, st2, j, a_pos, a_len)

            return jax.lax.cond(j >= dsz - msl, to_end, at_candidate, None)

        def sync_resolve(k, dsz, D_eff, b0, state):
            """Phase-C event resolution for a synced pair: v3's try_at
            walk reading its slice of the batched PCK/SALL/GEOALL."""
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, n_ss, n_ds) = state
            lo, hi = k * QROWS, (k + 1) * QROWS
            di = jax.lax.broadcasted_iota(I32, (QROWS, 1), 0)
            pck_col = jnp.min(PCK[lo:hi, :], axis=1, keepdims=True)

            def no_event(_):
                adv = D_eff
                new_lr = lit_run + adv
                desync = new_lr > mqd
                return (i + adv, jnp.where(desync, -dsz, pred + adv),
                        new_lr, reg_lo, reg_hi, top_lit, lit_below, ne,
                        pend, n_ss, n_ds)

            def try_at(carry):
                d0, done, out_state = carry
                pk = jnp.min(jnp.where(di >= d0, pck_col, BIG))

                def none_left(_):
                    st = no_event(None)
                    return (jnp.int32(BIG), jnp.bool_(True), st)

                def attempt(_):
                    dd = pk >> 23
                    has_anch = ((pk >> 22) & 1) > 0
                    s_found = ((pk >> 21) & 1) > 0
                    lmax = (pk >> 15) & 63
                    brel = (pk >> 6) & 511
                    s_pos = b0 + brel

                    def escalate(args):
                        rowi = jax.lax.broadcasted_iota(
                            I32, (QROWS, RCOLS), 0)
                        coli = jax.lax.broadcasted_iota(
                            I32, (QROWS, RCOLS), 1)
                        Sl = SALL[lo:hi, :]
                        vl = ((GEOALL[lo:hi, :] & 1) > 0) & (Sl >= msl)
                        capped_col = jnp.where(
                            (rowi == dd) & vl & (Sl == CAP), coli, BIG)

                        def nxt(c0):
                            return jnp.min(
                                jnp.where(capped_col >= c0, capped_col,
                                          BIG))

                        def contest(st):
                            c, blen, bpos, bdist = st
                            p = b0 + c
                            ml = exact_lce(
                                k, i + dd, p,
                                jnp.minimum(nr - p, dsz - (i + dd)))
                            dst = jnp.abs(p - (pred + dd))
                            better = (ml > blen) | (
                                (ml == blen) & (dst < bdist))
                            return (nxt(c + 1),
                                    jnp.where(better, ml, blen),
                                    jnp.where(better, p, bpos),
                                    jnp.where(better, dst, bdist))

                        c0 = nxt(jnp.int32(0))
                        _, blen, bpos, _ = jax.lax.while_loop(
                            lambda st: st[0] != BIG, contest,
                            (c0, jnp.int32(0), jnp.int32(0),
                             jnp.int32(BIG)))
                        return blen, bpos

                    s_len, s_pos = jax.lax.cond(
                        (lmax == CAP) & s_found, escalate,
                        lambda a: a, (lmax, s_pos))

                    a_len, a_pos = jax.lax.cond(
                        has_anch,
                        lambda _: resolve_anchor(k, dsz, i + dd),
                        lambda _: (jnp.int32(0), jnp.int32(0)), None)

                    def pick(_):
                        def arb(_):
                            alc = jnp.minimum(a_len, SAT) - mal
                            slc = jnp.minimum(s_len, SAT) - msl
                            lr_ev = lit_run + dd
                            widx = (alc * NS + slc) * NL + lr_ev
                            word = vext_r(win, 0, widx >> 5)
                            return ((word >> (widx & 31)) & 1) > 0

                        take_a = jax.lax.cond(
                            a_pos != 0,
                            lambda _: jax.lax.cond(
                                s_found & (s_pos != 0), arb,
                                lambda _: jnp.bool_(True), None),
                            lambda _: jnp.bool_(False), None)
                        take_a = take_a & (a_pos != 0)
                        use_seed = s_found & ~take_a
                        bl = jnp.where(take_a, a_len, s_len)
                        bp = jnp.where(take_a, a_pos, s_pos)
                        good = take_a | use_seed

                        def apply(_):
                            st2 = (i, pred, lit_run, reg_lo, reg_hi,
                                   top_lit, lit_below, ne, pend,
                                   n_ss, n_ds)
                            return (jnp.int32(BIG), jnp.bool_(True),
                                    apply_match(k, dsz, st2, i + dd,
                                                bp, bl))

                        def spurious(_):
                            return (dd + 1, jnp.bool_(False), out_state)

                        return jax.lax.cond(good, apply, spurious, None)

                    return pick(None)

                return jax.lax.cond(pk == BIG, none_left, attempt, None)

            init = (jnp.int32(0), jnp.bool_(False), state)
            _, _, out = jax.lax.while_loop(lambda c: ~c[1], try_at, init)
            return out

        # ---------------- lockstep main loop --------------------------------

        def init_state(k):
            dsz = scal_ref[k, 0]
            return (jnp.int32(0), -dsz, jnp.int32(0), jnp.int32(-1),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0),
                    jnp.int32(0), jnp.zeros((1, 128), I32),
                    jnp.int32(0), jnp.int32(0))

        def active(k, st):
            dsz = scal_ref[k, 0]
            return (st[0] + msl < dsz) & (st[7] < MAXEV - 1)

        def macro_cond(states):
            a = active(0, states[0])
            for k in range(1, K):
                a = a | active(k, states[k])
            return a

        riB = jax.lax.broadcasted_iota(I32, (RS, RCOLS), 0)
        ciB = jax.lax.broadcasted_iota(I32, (RS, RCOLS), 1)
        rlocB = riB % QROWS
        rlocC = jax.lax.broadcasted_iota(I32, (RS, 1), 0) % QROWS

        def macro_body(states):
            # ---- phase A: per-pair band inputs into stacked scratch ----
            cache = []
            for k in range(K):
                st = states[k]
                i, pred, lit_run = st[0], st[1], st[2]
                dsz = scal_ref[k, 0]
                act = active(k, st)
                syncp = act & (pred >= 0)
                D_eff = jnp.minimum(mqd - lit_run + 1, (dsz - msl) - i)
                b0 = jnp.maximum(pred - lit_run, 0)
                i_ld = jnp.clip(i, 0, LqP - 384)
                b0_ld = jnp.clip(b0, 0, LrP - RCOLS - 256)
                cache.append((dsz, act, syncp, D_eff, b0))

                @pl.when(syncp)
                def _(k=k, i_ld=i_ld, b0_ld=b0_ld, pred=pred, b0=b0,
                      D_eff=D_eff):
                    qrow = align_load_r(qbuf, k, i_ld, 128)
                    rrow = align_load_r(refbuf, 0, b0_ld, RCOLS)
                    qcol = _to_col(qrow, cmat[:, 0:128])[:QROWS]
                    E = (qcol == rrow).astype(I32)
                    rowi = jax.lax.broadcasted_iota(I32, (QROWS, RCOLS), 0)
                    coli = jax.lax.broadcasted_iota(I32, (QROWS, RCOLS), 1)
                    w = b0 + coli
                    pred_d = pred + rowi
                    geo = ((rowi < D_eff) & (coli < W + rowi)
                           & (w < pred_d + mrd))
                    dist = jnp.minimum(jnp.abs(w - pred_d), 127)
                    cvec = align_load_r(cand, k, i_ld, 128)
                    anch_col = _to_col((cvec > 0).astype(I32),
                                       cmat[:, 0:128])[:QROWS]
                    lo, hi = k * QROWS, (k + 1) * QROWS
                    EALL[lo:hi, :] = E
                    # bit0 = geo, bit1 = anchor-at-row (broadcast to cols)
                    GEOALL[lo:hi, :] = (geo.astype(I32)
                                        + 2 * (anch_col > 0).astype(I32))
                    DISTALL[lo:hi, :] = dist

                @pl.when(~syncp)
                def _(k=k):
                    # stale rows must not produce hits for this pair
                    lo, hi = k * QROWS, (k + 1) * QROWS
                    GEOALL[lo:hi, :] = jnp.zeros((QROWS, RCOLS), I32)

            # ---- phase B: ONE batched detect + LCE + tie-break pack ----
            E = EALL[:, :]
            GE = GEOALL[:, :]
            geo1 = (GE & 1) > 0
            A = _run_detect_blk(E, msl, rlocB, ciB)
            seedrow = jnp.max(jnp.where(geo1 & (A > 0), 1, 0), axis=1,
                              keepdims=True)
            anchrow = jnp.max(GE >> 1, axis=1, keepdims=True)
            rowvalid = jnp.max(jnp.where(geo1, 1, 0), axis=1,
                               keepdims=True)
            hitrow = ((seedrow > 0) | (anchrow > 0)) & (rowvalid > 0)
            S = _diag_lce_blk(E, CAP, rlocB, ciB)
            SALL[:, :] = S
            valid = geo1 & (S >= msl)
            Sv = jnp.where(valid, S, -1)
            row_lmax = jnp.max(Sv, axis=1, keepdims=True)
            tie = jnp.where((Sv == row_lmax) & (row_lmax >= 0),
                            ((127 - DISTALL[:, :]) << 9) | (511 - ciB),
                            -1)
            row_tie = jnp.max(tie, axis=1, keepdims=True)
            row_brel = 511 - (row_tie & 511)
            sf = row_lmax >= msl
            packed = jnp.where(
                hitrow,
                (rlocC << 23) + jnp.where(anchrow > 0, 1 << 22, 0)
                + jnp.where(sf, (1 << 21) + (row_lmax << 15)
                            + (row_brel << 6), 0),
                BIG)
            PCK[:, :] = jnp.broadcast_to(packed, (RS, 128))

            # ---- phase C: per-pair resolution --------------------------
            out = []
            for k in range(K):
                dsz, act, syncp, D_eff, b0 = cache[k]
                st = states[k]

                def sync_branch(s, k=k, dsz=dsz, D_eff=D_eff, b0=b0):
                    s = (s[0], s[1], s[2], s[3], s[4], s[5], s[6], s[7],
                         s[8], s[9] + 1, s[10])  # n_ss
                    return sync_resolve(k, dsz, D_eff, b0, s)

                def desync_branch(s, k=k, dsz=dsz):
                    return desync_step(k, dsz, s)

                st2 = jax.lax.cond(
                    act,
                    lambda s, k=k: jax.lax.cond(
                        s[1] >= 0,
                        sync_branch, desync_branch, s),
                    lambda s: s, st)
                out.append(st2)
            return tuple(out)

        states = tuple(init_state(k) for k in range(K))
        final = jax.lax.while_loop(macro_cond, macro_body, states)

        for k in range(K):
            dsz = scal_ref[k, 0]
            ne, pend = final[k][7], final[k][8]

            def flushp(_, k=k, ne=ne, pend=pend):
                blk = ne // 16
                ev_out[k:k + 1,
                       pl.ds(pl.multiple_of(blk * 128, 128), 128)] = pend

            jax.lax.cond(ne % 16 != 0, flushp, lambda _: None, None)
            nev_out[k, 0] = jnp.where(final[k][0] + msl < dsz, -1, ne)
            io = lane_iota(128)
            prof = jnp.where(io == 0, final[k][9],
                             jnp.where(io == 1, final[k][10], 0))
            ev_out[k:k + 1, EvL - 128:EvL] = prof

    return kernel
