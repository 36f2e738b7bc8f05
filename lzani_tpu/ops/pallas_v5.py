"""v5 event-log kernel: K-pair latency-interleaved lockstep.

Why a third kernel shape (see scripts/calibrate_mosaic_loop.py, round 2):
the v3 per-pair cost is dominated by the LATENCY of one event's chain of
dependent vector ops (window build -> capped diag-LCE -> combined reduce
-> pk extract), not by throughput or loop overhead — a 16-op dependent
(80,256) chain costs ~1.5 us/iteration, while TWO independent chains in
the same straight-line loop body cost the SAME and FOUR cost +2%. Cond
regions serialize additively but do not break the overlap.

v5 therefore runs K pairs per kernel program with the per-event window
phases emitted as straight-line code (pair 1's ops fill pair 0's latency
bubbles), and only the short decision tails under per-pair lax.conds.
This differs from both v4 increments, which are exactly the two shapes
the calibration shows CANNOT overlap: increment 1 put each pair's whole
superstep under a per-pair branch (conds serialize), increment 2 batched
the band phases into (K*80,256) stacked ops (one longer op has one
latency; it hides nothing and scales with elements).

Structural deltas vs v3 (all semantics-preserving):
  * the chained-window inner loop is flattened into the outer loop: every
    iteration (re)builds the window at the pair's current position. The
    spurious-anchor retry a_min therefore lives in the per-pair state
    (reset to 0 whenever the position advances) instead of an inner-loop
    carry; v3's chain rate was 1.07, so the lost window reuse is noise.
  * a pair's window phase also runs while the pair is desynced, done, or
    waiting (its results are ignored by the tails) — wasted work that is
    free in the latency shadow. Loads stay in-bounds for every reachable
    state because the driver pads buffers by +1024 before bucketing
    (i <= dsz <= LqP-1024; b0 <= nr <= LrP-1024; desynced pred<0 floors
    b0 at 0). When NO pair is synced, one shared cond skips all window
    phases, so desync-heavy stretches cost what v3's desync hops cost.

Exactness contract: identical event streams to the v3 kernel / native
oracle; the replay machinery downstream (lza_replay_finalize) is
unchanged. Reference semantics mirrored via v3: parser.cpp:482-716 (see
ops/pallas_engine.py for the per-construct citations).
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

__all__ = ["make_parse_kernel_ilv"]


def make_parse_kernel_ilv(cfg: ParseCfg, LrP: int, LqP: int, KaP: int,
                          WinP: int, EvL: int, K: int):
    """K-pair interleaved kernel. Block contract: scal (K,128) SMEM;
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

        # ---- helpers bound to pair row k (v3 bodies, row-indexed) --------
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
            # v3 ext_scan (pallas_engine.py) with row-k query loads
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

        def apply_match(k, state, i_ev, bpos, blen):
            # v3 apply_match (parser.cpp:626-697 via the scalar-tracking
            # argument); a_min (slot 9) resets with the position advance
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, _a_min) = state
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
            ext = ext_scan(k, i2, pred2,
                           jnp.minimum(dsz - i2, nr - pred2), BIG,
                           forward=True)
            ne2, pend2 = log_event(k, (ne, pend), i_ev, bpos, blen, bwd,
                                   ext)
            i3 = i2 + ext
            pred3 = pred2 + ext
            return (i3, pred3, jnp.int32(0), reg_lo2, i3, jnp.int32(0),
                    lit_below2, ne2, pend2, jnp.int32(0))

        def desync_step(k, state):
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, _a_min) = state
            dsz = dszs[k]
            j = vext_r(next_hit, k, i)

            def to_end(_):
                delta = (dsz - msl) - i
                return (i + delta, pred + delta, lit_run + delta, reg_lo,
                        reg_hi, top_lit, lit_below, ne, pend,
                        jnp.int32(0))

            def at_candidate(_):
                # desynced search has no position-0 sentinel
                # (parser.cpp:507-531 vs :604)
                a_len, a_pos = resolve_anchor(k, j)
                return apply_match(k, state, j, a_pos, a_len)

            return jax.lax.cond(j >= dsz - msl, to_end, at_candidate,
                                None)

        # ---- shared window constants (hoisted out of the loop) -----------
        rowi = jax.lax.broadcasted_iota(I32, (WROWS, WCOLS), 0)
        coli = jax.lax.broadcasted_iota(I32, (WROWS, WCOLS), 1)
        Scap = jnp.minimum(jnp.minimum(WROWS - rowi, WCOLS - coli), CAP)
        c511 = 511 - coli
        cmr = coli - rowi
        di = jax.lax.broadcasted_iota(I32, (WROWS, 1), 0)
        di23 = di << 23

        def window_phase_all(states):
            """Window build + combined reduce for ALL K pairs with the
            ops INTERLEAVED in emission (= program) order: op j of pair
            0, op j of pair 1, ..., then op j+1 of pair 0, ... Mosaic
            schedules mostly in order, so per-pair sequential BLOCKS do
            not overlap (measured: block-emitted v5 was neutral); the
            microbench shape that overlaps for free is exactly this
            per-op alternation (scripts/calibrate_mosaic_loop.py chain2/
            chain4). Semantics per pair are v3 sync_window lines 605-696
            with d_base == 0 (the flattened loop re-enters at i0 == i).
            Returns one dict per pair: the scalar pk plus the VREG
            context the rare contest path needs."""
            K_ = len(states)
            w = [{} for _ in range(K_)]
            # scalars (SREG work, cheap)
            for k, st in enumerate(states):
                i, pred, lit_run = st[0], st[1], st[2]
                w[k]["i0"] = i
                w[k]["b0"] = jnp.maximum(pred - lit_run, 0)
                w[k]["D_eff"] = jnp.minimum(mqd - lit_run + 1,
                                            (dszs[k] - msl) - i)
                w[k]["c_lo"] = (pred - lit_run) - w[k]["b0"]
                w[k]["off"] = pred - w[k]["b0"]
            # loads (independent; issue together)
            qrow = [align_load_r(qbuf, k, w[k]["i0"], 128)
                    for k in range(K_)]
            rrow = [align_load_r(refbuf, 0, w[k]["b0"], WCOLS)
                    for k in range(K_)]
            cvec = [align_load_r(cand, k, w[k]["i0"], 128)
                    for k in range(K_)]
            # MXU transposes
            qcol = [to_col(qrow[k], cmat[:, 0:128])[:WROWS]
                    for k in range(K_)]
            anch_col = [to_col((cvec[k] > 0).astype(I32),
                               cmat[:, 0:128])[:WROWS] for k in range(K_)]
            E = [(qcol[k] == rrow[k]).astype(I32) for k in range(K_)]
            # capped diagonal LCE, round-by-round across pairs (the
            # dependent chain each pair waits on; alternation hides it)
            S = list(E)
            step = 1
            while step < CAP:
                for k in range(K_):
                    M2 = pltpu.roll(pltpu.roll(S[k], WROWS - step, 0),
                                    WCOLS - step, 1)
                    take = ((S[k] == step) & (rowi < WROWS - step)
                            & (coli < WCOLS - step))
                    S[k] = S[k] + jnp.where(take, M2, 0)
                step *= 2
            for k in range(K_):
                w[k]["S"] = S[k]
                w[k]["SgeM"] = S[k] >= msl
                w[k]["SU"] = w[k]["SgeM"] & (S[k] < Scap)
                w[k]["S18"] = S[k] << 18
            Sbase = [jnp.where(w[k]["SgeM"] & (S[k] >= Scap), 1 << 24, 0)
                     + w[k]["S18"] for k in range(K_)]
            geo = [None] * K_
            tie = [None] * K_
            R1 = [None] * K_
            for k in range(K_):
                live = (rowi >= 0) & (rowi < w[k]["D_eff"])
                geo[k] = (live & (coli >= w[k]["c_lo"])
                          & (cmr < w[k]["off"] + mrd))
                tie[k] = ((127 - jnp.abs(cmr - w[k]["off"])) << 9) | c511
            for k in range(K_):
                R1[k] = jnp.max(
                    jnp.where(geo[k] & w[k]["SgeM"], Sbase[k] + tie[k],
                              -1), axis=1, keepdims=True)
            packed = [None] * K_
            for k in range(K_):
                cap_r = R1[k] >= (1 << 24)
                lmax_r = (R1[k] >> 18) & 63
                brel_r = 511 - (R1[k] & 511)
                sf_r = ~cap_r & (R1[k] >= (msl << 18))
                live1 = (di >= 0) & (di < w[k]["D_eff"])
                hit = ((R1[k] >= (msl << 18)) | (anch_col[k] > 0)) & live1
                anch_bit = jnp.where(anch_col[k] > 0, 1 << 22, 0)
                packed[k] = jnp.where(
                    hit,
                    di23 + anch_bit
                    + jnp.where(sf_r, (1 << 21) + (lmax_r << 15)
                                + (brel_r << 6), 0)
                    + jnp.where(cap_r, 1 << 5, 0),
                    BIG)
            for k in range(K_):
                a_min = states[k][9]
                w[k]["pk"] = jnp.min(jnp.where(di >= a_min, packed[k],
                                               BIG))
                w[k]["geo"] = geo[k]
                w[k]["tie"] = tie[k]
            return w

        def sync_tail(k, state, w):
            """v3 win_body decision tail (one event attempt), flattened:
            spurious advances a_min in the state and retries next
            iteration on an identical rebuilt window."""
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, a_min) = state
            dsz = dszs[k]
            pk, i0, b0 = w["pk"], w["i0"], w["b0"]
            D_eff = w["D_eff"]

            def no_event(_):
                adv = D_eff
                new_lr = lit_run + adv
                desync = new_lr > mqd
                return (i + adv, jnp.where(desync, -dsz, pred + adv),
                        new_lr, reg_lo, reg_hi, top_lit, lit_below,
                        ne, pend, jnp.int32(0))

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
                    # same position next iteration, reduce floor raised
                    return (i, pred, lit_run, reg_lo, reg_hi, top_lit,
                            lit_below, ne, pend, dd + 1)

                return jax.lax.cond(good, apply, spurious, None)

            return jax.lax.cond(pk == BIG, no_event, attempt, None)

        # ---- the interleaved lockstep loop --------------------------------
        def act_of(st, k):
            return (st[0] + msl < dszs[k]) & (st[7] < MAXEV - 1)

        def loop_cond(sts):
            a = act_of(sts[0], 0)
            for k in range(1, K):
                a = a | act_of(sts[k], k)
            return a

        def body(sts):
            acts = [act_of(sts[k], k) for k in range(K)]
            syncs = [acts[k] & (sts[k][1] >= 0) for k in range(K)]
            any_sync = syncs[0]
            for k in range(1, K):
                any_sync = any_sync | syncs[k]

            def win_branch(sts):
                # phase 1: ALL window builds straight-line (this is the
                # point of v5 — K independent dependent-op chains share
                # one latency shadow)
                ws = window_phase_all(sts)
                # phase 2: short per-pair decision tails (serialize)
                out = []
                for k in range(K):
                    def s_tail(stk, k=k, w=ws[k]):
                        return sync_tail(k, stk, w)

                    def other(stk, k=k):
                        return jax.lax.cond(
                            acts[k], lambda s: desync_step(k, s),
                            lambda s: s, stk)

                    out.append(jax.lax.cond(syncs[k], s_tail, other,
                                            sts[k]))
                return tuple(out)

            def desync_branch(sts):
                out = []
                for k in range(K):
                    out.append(jax.lax.cond(
                        acts[k], lambda s, k=k: desync_step(k, s),
                        lambda s: s, sts[k]))
                return tuple(out)

            return jax.lax.cond(any_sync, win_branch, desync_branch, sts)

        init = tuple(
            (jnp.int32(0), -dszs[k], jnp.int32(0), jnp.int32(-1),
             jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
             jnp.zeros((1, 128), I32), jnp.int32(0))
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
