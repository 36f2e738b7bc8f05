"""v6 event-log kernel: speculative next-window construction.

The round-2 floor analysis (DESIGN.md "round-2 final") priced the kernel
at 5-8 dependent dynamic-load round trips per event, NOT hideable across
pairs. Round-3 calibration (scripts/calibrate_round3.py) adds the
missing fact: a dependent scalar-load chain and an INDEPENDENT dependent
VPU chain in the same loop body overlap COMPLETELY (sum 4.5 us ->
combined 2.7 us = max), and extra independent loads per dependent step
are free (pair 463 ns vs single 464 ns). The serial cost of the window
build (loads -> E -> capped diag-LCE -> masks -> combined reduce -> pk
extract, ~1-1.5 us) is therefore only on the critical path because it
DEPENDS on the previous event's outcome.

v6 breaks that dependency by speculation on the common path: after a
match event, the post-state (i2, pred2, lit_run = 0) is known BEFORE the
forward approximate extension completes, and ext == 0 for ~77% of vir61
events (scripts/estimate_ext_skip.py). apply_match therefore

  1. hoists the forward-ext first-chunk loads (q[i2:], r[pred2:]) and
     REUSES them as the speculative next window's rows (they are exact
     prefixes: the window wants q[i2:i2+128] and r[b0':b0'+WCOLS] with
     b0' = max(pred2 - 0, 0) = pred2),
  2. builds the whole next window + combined reduce + pk extract
     speculatively (vector work, independent of the ext chain -> hidden
     in its latency shadow),
  3. verifies with the real ext: ext == 0 accepts the speculative pk
     (spec_pk state slot), anything else discards it (-1) and the next
     iteration rebuilds serially exactly as v5 does.

The rare paths that need the window MATRICES (capped-cell contest,
spurious-anchor retry) rebuild them on demand from the pair's scalar
state — deterministic, so the rebuilt window is bit-identical to the one
the speculative pk came from. No vector state crosses loop iterations.

Exactness contract: identical event streams to the v3/v5 kernels and the
native oracle (parser.cpp:482-716 semantics; per-construct citations in
ops/pallas_engine.py). Validated in interpret mode + on TPU against the
oracle (tests/test_pallas_v6.py, scripts/stress_kernel_interpret.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .anchor_tables import SAT
from .parse import ParseCfg
from .pallas_engine import (BIG, CAP, CEF, CH, I32, WCOLS, WROWS,
                            lane_iota, reverse_lanes, to_col,
                            align_load_r, vext_r)

__all__ = ["make_parse_kernel_spec"]


def make_parse_kernel_spec(cfg: ParseCfg, LrP: int, LqP: int, KaP: int,
                           WinP: int, EvL: int, K: int):
    """K-pair interleaved speculative kernel. Block contract matches
    make_parse_kernel_ilv (ops/pallas_v5.py): scal (K,128) SMEM;
    qbuf/cand/next_hit (K,LqP) VMEM; shared refbuf (1,LrP), poslist
    (1,KaP), win (1,WinP), cmat (128,512), cmat2 (CEF,2CEF); outputs
    ev (K,EvL) VMEM, nev (K,1) SMEM."""
    MAXEV = EvL // 128 * 16
    mal, msl, mrd, mqd = cfg.mal, cfg.msl, cfg.mrd, cfg.mqd
    reg, aw, am, ar = cfg.reg, cfg.aw, cfg.am, cfg.ar
    D = mqd + 1
    W = mqd + mrd
    NL = mqd + 1
    NS = SAT - msl + 1
    msl_eff = min(msl, CAP)
    assert D + msl_eff <= WROWS, (D, msl_eff)
    assert W + D + msl_eff <= WCOLS, (W, D, msl_eff)
    assert max(mqd, mrd) <= 127
    assert 1 <= aw <= 128 and 0 <= ar <= 128, (aw, ar)

    def kernel(scal_ref, refbuf, qbuf, poslist, cand, next_hit, win, cmat,
               cmat2, ev_out, nev_out):
        nr = scal_ref[0, 1]
        dszs = [scal_ref[k, 0] for k in range(K)]

        # ---- helpers bound to pair row k (v5 bodies) ---------------------
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

        def ext_scan(k, dpos, rpos, cap, max_len, forward, pre=None):
            """v5 ext_scan; `pre` = optionally preloaded (q0, r0) rows
            ((1, CEF) each, starting exactly at dpos / rpos) for the
            forward first chunk — apply_match hoists them so the same
            loads feed the speculative window build. The clip in the
            fresh-load path is an identity there (dpos <= dsz <=
            LqP-1024, rpos <= nr <= LrP-1024), so reuse is exact."""
            total = jnp.minimum(cap, max_len)
            CE = CEF if forward else 128
            io = lane_iota(CE)

            def load_miss(base):
                if forward:
                    qo = jnp.clip(dpos + base, 0, LqP - CE - 128)
                    ro = jnp.clip(rpos + base, 0, LrP - CE - 128)
                    qb = align_load_r(qbuf, k, qo, CE)
                    rb = align_load_r(refbuf, 0, ro, CE)
                    return (qb != rb).astype(I32)
                sq = dpos - base - CE
                sr = rpos - base - CE
                sh = jnp.clip(jnp.maximum(-sq, -sr), 0, CE)
                qb = align_load_r(qbuf, k,
                                  jnp.clip(sq + sh, 0, LqP - CE - 128), CE)
                rb = align_load_r(refbuf, 0,
                                  jnp.clip(sr + sh, 0, LrP - CE - 128), CE)
                m0 = (qb != rb).astype(I32)
                mr = reverse_lanes(m0, cmat[:, 128:256])
                return pltpu.roll(mr, CE - sh, 1)

            def win_sums(m_eff):
                return jax.lax.dot_general(
                    m_eff.astype(jnp.float32),
                    cmat2[:, :] if forward else cmat[:, 256:512],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(I32)

            nv = jnp.minimum(total, CE)
            if pre is not None:
                q0, r0 = pre
                miss = (q0 != r0).astype(I32)
            else:
                miss = load_miss(jnp.int32(0))
            valid = io < nv
            m_eff = jnp.where(valid, miss, 0)
            W2 = win_sums(m_eff)
            stop = valid & (W2[:, 0:CE] > am)
            fs = jnp.min(jnp.where(stop, io, CE), axis=1, keepdims=True)
            ok = (valid & (m_eff == 0) & (W2[:, CE:2 * CE] == 0)
                  & (io < fs))
            last_v = jnp.where(ok, io + 1, 0)
            P = fs * 1024 + jnp.max(last_v, axis=1, keepdims=True)
            p_sc = P[0, 0]
            last_sc = p_sc % 1024
            done_sc = (p_sc // 1024 < CE) | (nv < CE)

            def big_body(st):
                base, m_prev, last_v, _ = st
                lm = jnp.max(jnp.where(m_prev > 0, io, -1), axis=1,
                             keepdims=True)
                run0v = jnp.where(lm >= 0, jnp.minimum(CE - 1 - lm, ar),
                                  jnp.int32(ar))
                tail = pltpu.roll(m_prev, aw - 1, 1)
                tail = jnp.where(io <= aw - 2, tail, 0)
                nv = jnp.minimum(total - base, CE)
                miss = load_miss(base)
                valid = io < nv
                m_eff = jnp.where(valid, miss, 0)
                W2 = win_sums(m_eff)
                sufs = tail
                for stp in (1, 2, 4, 8):
                    sufs = sufs + jnp.where(
                        io < CE - stp, pltpu.roll(sufs, CE - stp, 1), 0)
                bad = W2[:, 0:CE] + jnp.where(io <= aw - 2, sufs, 0)
                stop = valid & (bad > am)
                fs = jnp.min(jnp.where(stop, io, CE), axis=1,
                             keepdims=True)
                extra = jnp.maximum((ar - 1 - run0v) - io, 0)
                ok = (valid & (m_eff == 0)
                      & ((W2[:, CE:2 * CE] + extra) == 0) & (io < fs))
                last_v = jnp.maximum(last_v,
                                     jnp.where(ok, base + io + 1, 0))
                done_sc = (fs[0, 0] < CE) | (nv < CE)
                return (base + CE, m_eff, last_v, done_sc)

            def big_cond(st):
                base, _, _, done_sc = st
                return (~done_sc) & (base < total)

            st = (jnp.int32(CE), m_eff, last_v, done_sc)
            st = jax.lax.while_loop(big_cond, big_body, st)
            return jax.lax.cond(st[0] > CE, lambda _: jnp.max(st[2]),
                                lambda _: last_sc, None)

        def resolve_anchor(k, jpos):
            pk = vext_r(cand, k, jpos)
            lo = pk >> 7
            cnt = pk & 127

            def run(_):
                pvec = align_load_r(poslist, 0, lo, 128)

                def body(c, st):
                    blen, bpos = st
                    pc = pltpu.roll(pvec, 128 - c, 1)[0, 0]
                    ml = exact_lce(k, jpos, pc,
                                   jnp.minimum(nr - pc, dszs[k] - jpos))
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

        # ---- window construction (shared by serial + speculative) -------
        rowi = jax.lax.broadcasted_iota(I32, (WROWS, WCOLS), 0)
        coli = jax.lax.broadcasted_iota(I32, (WROWS, WCOLS), 1)
        Scap = jnp.minimum(jnp.minimum(WROWS - rowi, WCOLS - coli), CAP)
        c511 = 511 - coli
        cmr = coli - rowi
        di = jax.lax.broadcasted_iota(I32, (WROWS, 1), 0)
        di23 = di << 23

        def window_scalars(k, i, pred, lit_run):
            b0 = jnp.maximum(pred - lit_run, 0)
            return dict(
                i0=i, b0=b0,
                D_eff=jnp.minimum(mqd - lit_run + 1, (dszs[k] - msl) - i),
                c_lo=(pred - lit_run) - b0,
                off=pred - b0)

        def finish_window(w, qrow128, rrowW, cvec):
            """v5 window_phase body from preloaded rows: E, capped
            diag-LCE, masks, per-row combined reduce -> packed rows.
            Semantics: v3 sync_window (pallas_engine.py:605-696) with
            d_base == 0."""
            qcol = to_col(qrow128, cmat[:, 0:128])[:WROWS]
            anch_col = to_col((cvec > 0).astype(I32),
                              cmat[:, 0:128])[:WROWS]
            E = (qcol == rrowW).astype(I32)
            S = E
            step = 1
            while step < CAP:
                M2 = pltpu.roll(pltpu.roll(S, WROWS - step, 0),
                                WCOLS - step, 1)
                take = ((S == step) & (rowi < WROWS - step)
                        & (coli < WCOLS - step))
                S = S + jnp.where(take, M2, 0)
                step *= 2
            SgeM = S >= msl
            S18 = S << 18
            Sbase = jnp.where(SgeM & (S >= Scap), 1 << 24, 0) + S18
            live = (rowi >= 0) & (rowi < w["D_eff"])
            geo = (live & (coli >= w["c_lo"])
                   & (cmr < w["off"] + mrd))
            tie = ((127 - jnp.abs(cmr - w["off"])) << 9) | c511
            R1 = jnp.max(jnp.where(geo & SgeM, Sbase + tie, -1),
                         axis=1, keepdims=True)
            cap_r = R1 >= (1 << 24)
            lmax_r = (R1 >> 18) & 63
            brel_r = 511 - (R1 & 511)
            sf_r = ~cap_r & (R1 >= (msl << 18))
            live1 = (di >= 0) & (di < w["D_eff"])
            hit = ((R1 >= (msl << 18)) | (anch_col > 0)) & live1
            anch_bit = jnp.where(anch_col > 0, 1 << 22, 0)
            packed = jnp.where(
                hit,
                di23 + anch_bit
                + jnp.where(sf_r, (1 << 21) + (lmax_r << 15)
                            + (brel_r << 6), 0)
                + jnp.where(cap_r, 1 << 5, 0),
                BIG)
            w["S"] = S
            w["SgeM"] = SgeM
            w["SU"] = SgeM & (S < Scap)
            w["S18"] = S18
            w["geo"] = geo
            w["tie"] = tie
            w["packed"] = packed
            return w

        def build_window(k, i, pred, lit_run):
            """Serial rebuild at the pair's current state (the v5 path:
            mispredicted / no-event / spurious / desync re-entry)."""
            w = window_scalars(k, i, pred, lit_run)
            qrow = align_load_r(qbuf, k, w["i0"], 128)
            rrow = align_load_r(refbuf, 0, w["b0"], WCOLS)
            cvec = align_load_r(cand, k, w["i0"], 128)
            return finish_window(w, qrow, rrow, cvec)

        def pk_from(w, a_min):
            return jnp.min(jnp.where(di >= a_min, w["packed"], BIG))

        def apply_match(k, state, i_ev, bpos, blen):
            """v5 apply_match (parser.cpp:626-697 via the scalar-tracking
            argument) + the speculative next-window build: the forward
            ext's first-chunk loads double as the next window's rows, the
            window + reduce + pk extract run in the ext chain's latency
            shadow, and ext == 0 (the 77% case) accepts the result."""
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, _a_min, _spec) = state
            dsz = dszs[k]
            lit_ev = lit_run + (i_ev - i)
            pred_ev = pred + (i_ev - i)
            close = (pred_ev >= 0) & (jnp.abs(bpos - pred_ev) <= mrd)
            tl = jnp.where(lit_ev > 0, lit_ev, top_lit)
            do_kill = (reg_lo >= 0) & (reg_hi - reg_lo < reg)
            run_len = (i_ev - reg_lo) + lit_below
            tl = jnp.where(do_kill, run_len, tl)

            def _bwd(_):
                return ext_scan(k, i_ev, bpos, jnp.minimum(i_ev, bpos),
                                tl, forward=False)

            bwd = jax.lax.cond((~close) & (tl > 0), _bwd,
                               lambda _: jnp.int32(0), None)
            use_bwd = bwd > 0
            rl = jnp.where(use_bwd, i_ev - bwd, i_ev)
            lb = jnp.where(use_bwd, tl - bwd, tl)
            reg_lo2 = jnp.where(close, reg_lo, rl)
            lit_below2 = jnp.where(close, lit_below, lb)

            i2 = i_ev + blen
            pred2 = bpos + blen
            # ---- speculative phase (independent vector work) -------------
            # hoisted loads: exact ext first chunk AND the next window's
            # rows (b0' = max(pred2 - 0, 0) = pred2 since pred2 >= 1)
            qx = align_load_r(qbuf, k, i2, CEF)
            rx = align_load_r(refbuf, 0, pred2, CEF)
            cvec2 = align_load_r(cand, k, i2, 128)
            w2 = window_scalars(k, i2, pred2, jnp.int32(0))
            w2 = finish_window(w2, qx[0:1, 0:128], rx[0:1, 0:WCOLS],
                               cvec2)
            pk2 = pk_from(w2, jnp.int32(0))
            # ---- the real forward extension (serial chain) ---------------
            ext = ext_scan(k, i2, pred2,
                           jnp.minimum(dsz - i2, nr - pred2), BIG,
                           forward=True, pre=(qx, rx))
            ne2, pend2 = log_event(k, (ne, pend), i_ev, bpos, blen, bwd,
                                   ext)
            i3 = i2 + ext
            pred3 = pred2 + ext
            spec = jnp.where(ext == 0, pk2, -1)
            return (i3, pred3, jnp.int32(0), reg_lo2, i3, jnp.int32(0),
                    lit_below2, ne2, pend2, jnp.int32(0), spec)

        def desync_step(k, state):
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, _a_min, _spec) = state
            dsz = dszs[k]
            j = vext_r(next_hit, k, i)

            def to_end(_):
                delta = (dsz - msl) - i
                return (i + delta, pred + delta, lit_run + delta, reg_lo,
                        reg_hi, top_lit, lit_below, ne, pend,
                        jnp.int32(0), jnp.int32(-1))

            def at_candidate(_):
                # desynced search has no position-0 sentinel
                # (parser.cpp:507-531 vs :604)
                a_len, a_pos = resolve_anchor(k, j)
                return apply_match(k, state, j, a_pos, a_len)

            return jax.lax.cond(j >= dsz - msl, to_end, at_candidate,
                                None)

        def sync_tail(k, state, pk, w_sc):
            """v5 decision tail; window matrices are NOT passed in — the
            rare contest path rebuilds them deterministically from the
            pair's scalar state (bit-identical to the window pk came
            from, speculative or serial)."""
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, a_min, _spec) = state
            dsz = dszs[k]
            i0, b0 = w_sc["i0"], w_sc["b0"]
            D_eff = w_sc["D_eff"]

            def no_event(_):
                adv = D_eff
                new_lr = lit_run + adv
                desync = new_lr > mqd
                return (i + adv, jnp.where(desync, -dsz, pred + adv),
                        new_lr, reg_lo, reg_hi, top_lit, lit_below,
                        ne, pend, jnp.int32(0), jnp.int32(-1))

            def attempt(_):
                dd = pk >> 23
                has_anch = ((pk >> 22) & 1) > 0
                sf_u = ((pk >> 21) & 1) > 0
                lmax_u = (pk >> 15) & 63
                brel_u = (pk >> 6) & 511
                has_cap = ((pk >> 5) & 1) > 0
                i_ev = i0 + dd
                pred_dd = pred + dd
                s_pos0 = b0 + brel_u

                def contest(args):
                    # exact re-contest of the row's capped cells; the
                    # window matrices are rebuilt here (rare path) —
                    # deterministic in (i, pred, lit_run), so identical
                    # to the matrices behind pk
                    w = build_window(k, i, pred, lit_run)
                    rmask = (rowi == dd) & w["geo"]
                    RU = jnp.max(jnp.where(rmask & w["SU"],
                                           w["S18"] + w["tie"], -1))
                    sfu2 = RU >= (msl << 18)
                    bl0 = jnp.where(sfu2, (RU >> 18) & 63, 0)
                    bp0 = jnp.where(sfu2, b0 + (511 - (RU & 511)), 0)
                    bdst0 = jnp.where(sfu2, jnp.abs(bp0 - pred_dd), BIG)
                    capped_col = jnp.where(
                        rmask & w["SgeM"] & (w["S"] >= Scap), coli, BIG)

                    def nxt(c0):
                        return jnp.min(
                            jnp.where(capped_col >= c0, capped_col, BIG))

                    def body(cst):
                        c, blen, bpos, bdst = cst
                        p = b0 + c
                        ml = exact_lce(k, i_ev, p,
                                       jnp.minimum(nr - p, dsz - i_ev))
                        dst = jnp.abs(p - pred_dd)
                        better = ((ml > blen)
                                  | ((ml == blen) & (dst < bdst))
                                  | ((ml == blen) & (dst == bdst)
                                     & (p < bpos)))
                        return (nxt(c + 1),
                                jnp.where(better, ml, blen),
                                jnp.where(better, p, bpos),
                                jnp.where(better, dst, bdst))

                    c0 = nxt(jnp.int32(0))
                    _, blen, bpos, _ = jax.lax.while_loop(
                        lambda cst: cst[0] != BIG, body,
                        (c0, bl0, bp0, bdst0))
                    return blen, bpos

                s_len, s_pos = jax.lax.cond(
                    has_cap, contest, lambda a: a,
                    (jnp.where(sf_u, lmax_u, 0),
                     jnp.where(sf_u, s_pos0, 0)))
                s_found = sf_u | has_cap

                a_len, a_pos = jax.lax.cond(
                    has_anch,
                    lambda _: resolve_anchor(k, i_ev),
                    lambda _: (jnp.int32(0), jnp.int32(0)), None)

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
                    return apply_match(k, state, i_ev, bp, bl)

                def spurious(_):
                    # same position next iteration, reduce floor raised;
                    # the identical window is rebuilt serially (spec -1)
                    return (i, pred, lit_run, reg_lo, reg_hi, top_lit,
                            lit_below, ne, pend, dd + 1, jnp.int32(-1))

                return jax.lax.cond(good, apply, spurious, None)

            return jax.lax.cond(pk == BIG, no_event, attempt, None)

        # ---- the speculative lockstep loop --------------------------------
        def act_of(st, k):
            return (st[0] + msl < dszs[k]) & (st[7] < MAXEV - 1)

        def loop_cond(sts):
            a = act_of(sts[0], 0)
            for k in range(1, K):
                a = a | act_of(sts[k], k)
            return a

        def body(sts):
            out = []
            for k in range(K):
                st = sts[k]
                act = act_of(st, k)
                synced = st[1] >= 0

                def sync_path(s, k=k):
                    w_sc = window_scalars(k, s[0], s[1], s[2])
                    # accept the speculative pk when the previous event
                    # verified it (ext == 0); rebuild serially otherwise
                    pk = jax.lax.cond(
                        s[10] >= 0,
                        lambda _: s[10],
                        lambda _: pk_from(build_window(k, s[0], s[1],
                                                       s[2]), s[9]),
                        None)
                    return sync_tail(k, s, pk, w_sc)

                def run_pair(s, k=k):
                    return jax.lax.cond(s[1] >= 0, sync_path,
                                        lambda ss, k=k: desync_step(k, ss),
                                        s)

                out.append(jax.lax.cond(act, run_pair, lambda s: s, st))
            return tuple(out)

        init = tuple(
            (jnp.int32(0), -dszs[k], jnp.int32(0), jnp.int32(-1),
             jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
             jnp.zeros((1, 128), I32), jnp.int32(0), jnp.int32(-1))
            for k in range(K))
        finals = jax.lax.while_loop(loop_cond, body, init)

        for k in range(K):
            fk = finals[k]
            ne, pend = fk[7], fk[8]

            def flushp(_, k=k, ne=ne, pend=pend):
                blk = ne // 16
                ev_out[k:k + 1,
                       pl.ds(pl.multiple_of(blk * 128, 128), 128)] = pend

            jax.lax.cond(ne % 16 != 0, flushp, lambda _: None, None)
            nev_out[k, 0] = jnp.where(fk[0] + msl < dszs[k], -1, ne)

    return kernel
