"""v7 event-log kernel: fully-predicated SIMT decision tails.

Round-3 calibration (scripts/calibrate_mosaic_loads.py `alt K=`) showed
the round-2 "serial floor" was an EMISSION artifact: K dependent
dynamic-load chains emitted ALTERNATED per-op cost 1.01x/1.05x/1.13x a
single chain at K=2/4/8 (block-sequential emission measured
1.7x/2.6x — the number the round-2 ceiling was derived from). The v5/v6
kernels alternate only the window phase; their per-event decision tails
(anchor resolve, WIN probe, exact-LCE chunks, ext chunks — the 5-8
dependent round trips per event) sit under per-pair `lax.cond`s, which
serialize additively and cannot alternate. Flat v6 timings at
ilv=2/4/8 confirm the tails are the entire remaining cost.

v7 therefore makes the tail BRANCHLESS: every pair advances one
superstep per macro-iteration through ONE straight-line predicated
pipeline whose ops are emitted alternated across the K pairs —
  * sync/desync/no-event/to-end outcomes become masked selects;
  * the anchor resolve becomes a SIMT micro-state loop: each iteration
    every pair advances one 512-lane LCE chunk of its current
    candidate (candidate index, chunk offset, best carried per pair);
  * the WIN arbitration probe is an always-issued clamped load;
  * forward/backward extension FIRST chunks run for all pairs
    alternated (77% of extensions end inside the first chunk);
  * the event-log flush cond is gone: the pending block is stored
    every event (idempotent rewrite of the same lanes).
Rare paths keep shared `lax.cond`s taken only when SOME pair needs
them: the capped-cell contest, and multi-chunk extension continuations
(per-pair serial inside, as v5 — rare by measurement).

Exactness contract: identical event streams to the v3/v5/v6 kernels and
the native oracle; the replay machinery downstream
(lza_replay_finalize) is unchanged. Reference semantics mirrored via
v3: parser.cpp:482-716 (per-construct citations in ops/pallas_engine.py).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .anchor_tables import SAT
from .parse import ParseCfg
from . import pallas_engine as _pe
from .pallas_engine import (BIG, CAP, CEF, CH, I32, WCOLS, WROWS,
                            lane_iota, reverse_lanes, to_col,
                            align_load_r, align_load_r8, vext_r,
                            vext_rw)

__all__ = ["make_parse_kernel_sim"]


def make_parse_kernel_sim(cfg: ParseCfg, LrP: int, LqP: int, KaP: int,
                          WinP: int, EvL: int, K: int,
                          WR: int | None = None, CEF_: int | None = None,
                          WC: int | None = None, AU: int = 1,
                          MU: int = 1):
    """K-pair predicated-SIMT kernel. Block contract matches
    make_parse_kernel_ilv (ops/pallas_v5.py): scal (K,128) SMEM;
    qbuf/cand/next_hit (K,LqP) VMEM; shared refbuf (1,LrP), poslist
    (1,KaP), win (1,WinP), cmat (128,512), cmat2 (CEFV,2CEFV); outputs
    ev (K,EvL) VMEM, nev (K,1) SMEM.

    Round 5: qbuf and refbuf arrive INT8 (codes 0..5 + sentinels) — 1/4
    the VMEM residency of the round-4 kernel, which is what lets K=16
    fit the 16 MB budget (at i32 it measured 104 KB over). Every load
    widens to i32 via align_load_r8 (slice i8 -> extend -> roll; this
    target supports neither rotate nor compare on sub-32-bit vectors).
    cand/next_hit/poslist/win stay i32."""
    MAXEV = EvL // 128 * 16
    mal, msl, mrd, mqd = cfg.mal, cfg.msl, cfg.mrd, cfg.mqd
    reg, aw, am, ar = cfg.reg, cfg.aw, cfg.am, cfg.ar
    D = mqd + 1
    W = mqd + mrd
    NL = mqd + 1
    NS = SAT - msl + 1
    msl_eff = min(msl, CAP)
    # next_hit arrives biased-i16 at the small query bucket (the
    # engine converts; pure function of LqP, so the executable-cache
    # keys already separate the variants via LqP)
    NH16 = LqP <= (1 << 16)
    assert D + msl_eff <= WROWS, (D, msl_eff)
    assert W + D + msl_eff <= WCOLS, (W, D, msl_eff)
    assert max(mqd, mrd) <= 127
    assert 1 <= aw <= 128 and 0 <= ar <= 128, (aw, ar)
    # window-row geometry (LZANI_TPU_WROWS A/B probe): legality only
    # needs D + msl_eff rows (48 at defaults); the compiled 80 adds
    # diagonal runway that keeps edge-cap contest escalations rare.
    # Fewer rows shrink EVERY window-cluster op (the profiled v7red +
    # v7win floor, 26% of wall) at the price of more exact re-contests
    # for long runs in high rows — rare, because the nearest-row pick
    # (di23 dominance in pk) favors small rowi. Bit-exact at any legal
    # WR: capped cells always escalate to exact LCE (contest_one).
    WR = WR or int(_os.environ.get("LZANI_TPU_WROWS", "0")) or WROWS
    assert WR % 8 == 0 and D + msl_eff <= WR <= 128, WR
    # window-column geometry, same argument as WR: legality only needs
    # W + D + msl_eff cols (128 at defaults) — the compiled 256 is
    # diagonal runway. Col shrink raises edge-cap contest escalations
    # more than row shrink does (winners are longest-run-in-row at ANY
    # column), so this stays A/B-gated. <= 512 keeps the 9-bit c511
    # tie field exact.
    WC = WC or int(_os.environ.get("LZANI_TPU_WCOLS", "0")) or WCOLS
    assert WC % 128 == 0 and W + D + msl_eff <= WC <= 512, WC
    # the WIN table's maximum legal index (clamp target for the
    # always-issued arbitration probe; valid probes never exceed it)
    WIDX_MAX = ((SAT - mal) * NS + (SAT - msl)) * NL + mqd
    # forward-ext first-chunk width (production auto = 256, threaded in
    # from the engine so it keys every executable cache): ext > 256 is
    # 0.81%/event on vir61, so halving the (CEF, 2CEF) banded matmul —
    # the profiled v7ext cluster — costs almost no continuations. Reads
    # the top-left quadrants of the resident cmat2; CEF_ == CEF (512)
    # reproduces the round-3 kernel exactly.
    CEFV = CEF_ or int(_os.environ.get("LZANI_TPU_CEF", "0")) or CEF
    assert CEFV in (128, 256, CEF), CEFV

    # phase-doubling profile hooks (scripts/profile_v7_phases.py): each
    # tag recomputes one phase with a runtime-zero perturbation and folds
    # it in — bit-identical results, Mosaic can't DCE it, the timing
    # delta attributes that phase's share of the iteration
    PROF = _pe.PROF_DOUBLE

    def kernel(scal_ref, refbuf, qbuf, poslist, cand, next_hit, win, cmat,
               cmat2, ev_out, nev_out):
        nr = scal_ref[0, 1]
        dszs = [scal_ref[k, 0] for k in range(K)]
        z = scal_ref[0, 7]  # runtime zero (scal lanes >= 2 ship 0)

        # ---- serial helpers for the RARE shared-cond paths (v5 verbatim,
        # row-indexed; see ops/pallas_v5.py for the per-line provenance)
        def exact_lce(k, qs, rs, cap):
            def body(st):
                off, _ = st
                qb = align_load_r8(qbuf, k, qs + off, CH)
                rb = align_load_r8(refbuf, 0, rs + off, CH)
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

        # ---- extension scan split into an alternating first chunk and a
        # rare serial continuation (v5 ext_scan, restructured)
        def ext_load_miss(k, dpos, rpos, base, forward):
            if forward:
                CE = CEFV
                qo = jnp.clip(dpos + base, 0, LqP - CE - 128)
                ro = jnp.clip(rpos + base, 0, LrP - CE - 128)
                qb = align_load_r8(qbuf, k, qo, CE)
                rb = align_load_r8(refbuf, 0, ro, CE)
                return (qb != rb).astype(I32)
            CE = 128
            sq = dpos - base - CE
            sr = rpos - base - CE
            sh = jnp.clip(jnp.maximum(-sq, -sr), 0, CE)
            qb = align_load_r8(qbuf, k,
                              jnp.clip(sq + sh, 0, LqP - CE - 128), CE)
            rb = align_load_r8(refbuf, 0,
                              jnp.clip(sr + sh, 0, LrP - CE - 128), CE)
            m0 = (qb != rb).astype(I32)
            mr = reverse_lanes(m0, cmat[:, 128:256])
            return pltpu.roll(mr, CE - sh, 1)

        def ext_win_sums(m_eff, forward):
            if "v7extps" in PROF:
                # log-step prefix-sum variant (A/B vs the MXU banded
                # matmul): W[e] = P[e] - P[e-width], exact in int32
                CE = CEFV if forward else 128
                io = lane_iota(CE)
                P = m_eff
                s = 1
                while s < CE:
                    P = P + jnp.where(io >= s, pltpu.roll(P, s, 1), 0)
                    s *= 2
                Waw = P - jnp.where(io >= aw, pltpu.roll(P, aw, 1), 0)
                War = P - jnp.where(io >= ar, pltpu.roll(P, ar, 1), 0)
                return jnp.concatenate([Waw, War], axis=1)
            # cmat2 ships PRE-SIZED at (CEFV, 2*CEFV) by the engine
            # (build_const_mat2(aw, ar, cef)): one full-matrix banded
            # matmul yields concat(Waw, War) directly
            return jax.lax.dot_general(
                m_eff.astype(jnp.float32),
                cmat2[:, :] if forward else cmat[:, 256:512],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(I32)

        def ext_win_sums_batch(m_effs, forward):
            """ONE (K, CE) x (CE, 2CE) MXU matmul for ALL pairs' chunk
            decision sums (round 5): the MXU pipeline cost of a 16-row
            operand equals a 1-row one, so stacking the K rows makes the
            per-pair matmul ~K-fold cheaper than the round-4 K separate
            single-row contractions (v7ext was the top profiled phase,
            +14.1%). Returns the stacked (K, 2CE) result; callers slice
            their static row. PROF v7extps A/Bs the per-pair prefix-sum
            variant through the same interface."""
            if "v7extps" in PROF:
                return jnp.concatenate(
                    [ext_win_sums(m, forward) for m in m_effs], axis=0)
            M = jnp.concatenate(m_effs, axis=0)
            return jax.lax.dot_general(
                M.astype(jnp.float32),
                cmat2[:, :] if forward else cmat[:, 256:512],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(I32)

        def ext_first_all(dposs, rposs, tots, forward, zoff=None):
            """First extension chunks for ALL K pairs: loads alternated,
            decision sums in one batched MXU matmul, per-pair reduces
            alternated. Returns [(last_sc, done_sc, m_eff, last_v)] per
            pair (the v5 ext_scan first-iteration contract). zoff (a
            runtime zero) builds the PROF v7ext doubling twin."""
            CE = CEFV if forward else 128
            io = lane_iota(CE)
            z_ = zoff if zoff is not None else 0
            miss = [ext_load_miss(k, dposs[k] + z_, rposs[k] + z_,
                                  jnp.int32(0), forward)
                    for k in range(K)]
            nvs = [jnp.minimum(tots[k], CE) for k in range(K)]
            valids = [io < nvs[k] for k in range(K)]
            m_effs = [jnp.where(valids[k], miss[k], 0) for k in range(K)]
            W2 = ext_win_sums_batch(m_effs, forward)
            out = []
            for k in range(K):
                W2k = W2[k:k + 1, :]
                stop = valids[k] & (W2k[:, 0:CE] > am)
                fs = jnp.min(jnp.where(stop, io, CE), axis=1,
                             keepdims=True)
                ok = (valids[k] & (m_effs[k] == 0)
                      & (W2k[:, CE:2 * CE] == 0) & (io < fs))
                last_v = jnp.where(ok, io + 1, 0)
                P = fs * 1024 + jnp.max(last_v, axis=1, keepdims=True)
                p_sc = P[0, 0]
                last_sc = p_sc % 1024
                done_sc = (p_sc // 1024 < CE) | (nvs[k] < CE)
                out.append((last_sc, done_sc, m_effs[k], last_v))
            return out

        def ext_continue_all(lives0, dposs, rposs, tots, firsts, forward):
            """Multi-chunk extension continuations for ALL live pairs in
            LOCKSTEP (round 5, the high-ANI floor lever — DESIGN.md
            round-4 continued 5): one shared while loop advances every
            still-live pair by one CE chunk per iteration (wall = MAX of
            the per-pair chunk counts, not the SUM the per-pair serial
            conds paid), with the chunk decision sums batched into one
            MXU matmul. Per-chunk semantics are v5 big_body verbatim;
            dead pairs' rows ride along masked."""
            CE = CEFV if forward else 128
            io = lane_iota(CE)
            inits = []
            for k in range(K):
                inits.extend([jnp.int32(CE), ~lives0[k],
                              firsts[k][2], firsts[k][3]])

            def unpack(st):
                return [st[4 * k:4 * k + 4] for k in range(K)]

            def loop_cond(st):
                alive = None
                for k in range(K):
                    a = (~st[4 * k + 1]) & (st[4 * k] < tots[k])
                    alive = a if alive is None else (alive | a)
                return alive

            def loop_body(st):
                ps = unpack(st)
                lives = [(~ps[k][1]) & (ps[k][0] < tots[k])
                         for k in range(K)]
                miss = [ext_load_miss(k, dposs[k], rposs[k],
                                      jnp.where(lives[k], ps[k][0], 0),
                                      forward) for k in range(K)]
                nvs = [jnp.minimum(tots[k] - ps[k][0], CE)
                       for k in range(K)]
                m_effs = [jnp.where(io < nvs[k], miss[k], 0)
                          for k in range(K)]
                W2 = ext_win_sums_batch(m_effs, forward)
                out = []
                for k in range(K):
                    base, done, m_prev, last_v = ps[k]
                    lm = jnp.max(jnp.where(m_prev > 0, io, -1), axis=1,
                                 keepdims=True)
                    run0v = jnp.where(lm >= 0,
                                      jnp.minimum(CE - 1 - lm, ar),
                                      jnp.int32(ar))
                    tail = pltpu.roll(m_prev, aw - 1, 1)
                    tail = jnp.where(io <= aw - 2, tail, 0)
                    sufs = tail
                    for stp in (1, 2, 4, 8):
                        sufs = sufs + jnp.where(
                            io < CE - stp, pltpu.roll(sufs, CE - stp, 1),
                            0)
                    W2k = W2[k:k + 1, :]
                    bad = W2k[:, 0:CE] + jnp.where(io <= aw - 2, sufs, 0)
                    stop = (io < nvs[k]) & (bad > am)
                    fs = jnp.min(jnp.where(stop, io, CE), axis=1,
                                 keepdims=True)
                    extra = jnp.maximum((ar - 1 - run0v) - io, 0)
                    ok = ((io < nvs[k]) & (m_effs[k] == 0)
                          & ((W2k[:, CE:2 * CE] + extra) == 0)
                          & (io < fs))
                    lv2 = jnp.maximum(last_v,
                                      jnp.where(ok, base + io + 1, 0))
                    done2 = done | (lives[k]
                                    & ((fs[0, 0] < CE) | (nvs[k] < CE)))
                    out.extend([
                        jnp.where(lives[k], base + CE, base),
                        done2,
                        jnp.where(lives[k], m_effs[k], m_prev),
                        jnp.where(lives[k], lv2, last_v)])
                return tuple(out)

            def loop_bodyN(st):
                for _ in range(AU):   # masked updates: double-step safe
                    st = loop_body(st)
                return st

            st = jax.lax.while_loop(loop_cond, loop_bodyN, tuple(inits))
            ps = unpack(st)
            return tuple(
                jnp.where(lives0[k], jnp.max(ps[k][3]), firsts[k][0])
                for k in range(K))

        def log_event(k, st, i_ev, bpos, blen, bwd, ext, good):
            """v5 log_event, predicated: the record merges into the
            pending block only where `good`; the block store is ALWAYS
            issued (rewriting identical lanes when ~good), removing the
            per-pair flush cond."""
            ne, pend = st
            lane0 = (ne % 16) * 8
            io = lane_iota(128)
            rec = jnp.where(io == lane0, i_ev,
                  jnp.where(io == lane0 + 1, bpos,
                  jnp.where(io == lane0 + 2, blen,
                  jnp.where(io == lane0 + 3, bwd,
                  jnp.where(io == lane0 + 4, ext, 0)))))
            pend = jnp.where(good & (io >= lane0) & (io < lane0 + 8),
                             rec, pend)
            blk = ne // 16
            ev_out[k:k + 1,
                   pl.ds(pl.multiple_of(blk * 128, 128), 128)] = pend
            if "v7store" in PROF:  # double the per-event block store
                ev_out[k:k + 1,
                       pl.ds(pl.multiple_of((blk + z) * 128, 128),
                             128)] = pend
            ne2 = ne + jnp.where(good, 1, 0)
            pend = jnp.where(good & (ne2 % 16 == 0),
                             jnp.zeros((1, 128), I32), pend)
            return ne2, pend

        # ---- shared window constants (hoisted out of the loop) -----------
        # The S-chain must run on the FULL (WROWS, WCOLS) window (runway
        # for CAP-length diagonal runs), but every REDUCE consumer —
        # geo/tie masks, R1, the packed pk build, the contest — only
        # reads rows < D (candidate offsets) and cols < W + D (the geo
        # bound coli < off + mrd + rowi <= mqd + mrd + D - 1). Slicing
        # the reduce cluster to (RR, RC) cuts its element work ~3.3x at
        # defaults ((48,128) vs (80,256)); the round-4 phase profile
        # attributes 17.9% of wall to exactly this cluster
        # (scripts/profile_v7_phases.py v7red).
        # Round-4 negative result (kept for the record): slicing the
        # chain output S to the (ceil(D/8)*8, 128) region its reduce
        # consumers actually read — a ~3.3x element shrink of the
        # profiled-heaviest cluster (v7red, +17.9%) — is Mosaic-illegal
        # in this toolchain: vector_extract_strided_slice_rule aborts
        # (Check failed: limits[i] <= dim(i)) on both the lane slice
        # (2^16-bucket (80,256) -> (48,128)) AND the sublane-only slice
        # of the rolled S value. to_col outputs slice fine; rolled-chain
        # outputs do not. Revisit when Mosaic's strided-slice layout
        # support widens.
        RR = WR
        RC = WC
        rowiF = jax.lax.broadcasted_iota(I32, (WR, WC), 0)
        coliF = jax.lax.broadcasted_iota(I32, (WR, WC), 1)
        rowi = rowiF[:RR, :RC]
        coli = coliF[:RR, :RC]
        # per-cell saturation uses the FULL window dims (the chain ran
        # there); slicing the precomputed matrix keeps values identical
        Scap = jnp.minimum(jnp.minimum(WR - rowi, WC - coli), CAP)
        c511 = 511 - coli
        cmr = coli - rowi
        di = jax.lax.broadcasted_iota(I32, (RR, 1), 0)
        di23 = di << 23

        def window_phase_all(states):
            """v5 window_phase_all verbatim (ops/pallas_v5.py:296-385):
            window build + combined reduce for ALL K pairs, ops emitted
            alternated per-op across pairs."""
            K_ = len(states)
            w = [{} for _ in range(K_)]
            for k, st in enumerate(states):
                i, pred, lit_run = st[0], st[1], st[2]
                w[k]["i0"] = i
                w[k]["b0"] = jnp.maximum(pred - lit_run, 0)
                w[k]["D_eff"] = jnp.minimum(mqd - lit_run + 1,
                                            (dszs[k] - msl) - i)
                w[k]["c_lo"] = (pred - lit_run) - w[k]["b0"]
                w[k]["off"] = pred - w[k]["b0"]
            qrow = [align_load_r8(qbuf, k, w[k]["i0"], 128)
                    for k in range(K_)]
            rrow = [align_load_r8(refbuf, 0, w[k]["b0"], WC)
                    for k in range(K_)]
            cvec = [align_load_r(cand, k, w[k]["i0"], 128)
                    for k in range(K_)]
            if "v7loads" in PROF:  # double the dynamic window loads
                qrow = [jnp.minimum(qrow[k], align_load_r8(
                    qbuf, k, w[k]["i0"] + z, 128)) for k in range(K_)]
                rrow = [jnp.minimum(rrow[k], align_load_r8(
                    refbuf, 0, w[k]["b0"] + z, WC)) for k in range(K_)]
                cvec = [jnp.minimum(cvec[k], align_load_r(
                    cand, k, w[k]["i0"] + z, 128)) for k in range(K_)]
            qcol = [to_col(qrow[k], cmat[:, 0:128])[:WR]
                    for k in range(K_)]
            anch_col = [to_col((cvec[k] > 0).astype(I32),
                               cmat[:, 0:128])[:RR] for k in range(K_)]
            if "v7tocol" in PROF:  # double the MXU transposes
                qcol = [jnp.minimum(qcol[k], to_col(
                    qrow[k] + z, cmat[:, 0:128])[:WR])
                        for k in range(K_)]
                anch_col = [jnp.minimum(anch_col[k], to_col(
                    (cvec[k] > 0).astype(I32) + z,
                    cmat[:, 0:128])[:RR]) for k in range(K_)]
            E = [(qcol[k] == rrow[k]).astype(I32) for k in range(K_)]
            S = list(E)
            step = 1
            while step < CAP:
                for k in range(K_):
                    M2 = pltpu.roll(pltpu.roll(S[k], WR - step, 0),
                                    WC - step, 1)
                    take = ((S[k] == step) & (rowiF < WR - step)
                            & (coliF < WC - step))
                    S[k] = S[k] + jnp.where(take, M2, 0)
                step *= 2
            if "v7win" in PROF:  # double the alternated S-chain
                S2 = [(qcol[k] == pltpu.roll(rrow[k], WC - z, 1)
                       ).astype(I32) for k in range(K_)]
                step = 1
                while step < CAP:
                    for k in range(K_):
                        M2 = pltpu.roll(pltpu.roll(S2[k], WR - step, 0),
                                        WC - step, 1)
                        take = ((S2[k] == step) & (rowiF < WR - step)
                                & (coliF < WC - step))
                        S2[k] = S2[k] + jnp.where(take, M2, 0)
                    step *= 2
                # z == 0 -> the roll is a full cycle -> S2 == S; the min
                # is an identity the compiler cannot prove
                S = [jnp.minimum(S[k], S2[k]) for k in range(K_)]
            if RR < WR:  # see the RR/RC note above (Mosaic-blocked)
                S = [S[k][:RR] for k in range(K_)]
            for k in range(K_):
                w[k]["S"] = S[k]
                w[k]["SgeM"] = S[k] >= msl
                w[k]["SU"] = w[k]["SgeM"] & (S[k] < Scap)
                w[k]["S18"] = S[k] << 18
            Sbase = [jnp.where(w[k]["SgeM"] & (S[k] >= Scap), 1 << 24, 0)
                     + w[k]["S18"] for k in range(K_)]
            geo = [None] * K_
            tie = [None] * K_
            for k in range(K_):
                live = (rowi >= 0) & (rowi < w[k]["D_eff"])
                geo[k] = (live & (coli >= w[k]["c_lo"])
                          & (cmr < w[k]["off"] + mrd))
                tie[k] = ((127 - jnp.abs(cmr - w[k]["off"])) << 9) | c511
            # single-pass reduce (promoted round 4, was the v7pk1
            # probe): one (WR,WC) min over a rowi<<25 | ~(Sbase+tie)
            # cell key replaces the per-row max, the (RR,1) packed
            # rebuild, and the row min — the min picks the NEAREST row
            # (di23 dominance, as the old packed row-min did) and
            # within it the MAX Sbase+tie (identical tie-break chain);
            # the pk bit layout reassembled below is byte-for-byte the
            # old one, so the decision tail is untouched. A/B: vir61
            # 0.522 vs 0.544 s/group (-4.0%, three interleaved pairs),
            # dissim best 779.6 vs 714.4 pairs/s, near-identical tied;
            # oracle-exact every phase (DESIGN.md round-4 continued 4).
            I32MAX = (1 << 31) - 1
            M25 = (1 << 25) - 1
            for k in range(K_):
                a_min = states[k][9]
                valid = (geo[k] & w[k]["SgeM"] & (rowi >= a_min))
                Kc = jnp.where(
                    valid,
                    (rowi << 25) + (M25 - (Sbase[k] + tie[k])),
                    I32MAX)
                m_ = jnp.min(Kc)
                live1 = (di >= 0) & (di < w[k]["D_eff"])
                am_ = jnp.min(jnp.where(
                    (anch_col[k] > 0) & live1 & (di >= a_min),
                    di, BIG))
                if "v7red" in PROF:  # double the cell min + anchor min
                    Kc2 = jnp.where(
                        geo[k] & w[k]["SgeM"] & (rowi >= a_min + z),
                        (rowi << 25) + (M25 - (Sbase[k] + tie[k])),
                        I32MAX)
                    m_ = jnp.minimum(m_, jnp.min(Kc2))
                    am_ = jnp.minimum(am_, jnp.min(jnp.where(
                        (anch_col[k] > 0) & live1 & (di >= a_min + z),
                        di, BIG)))
                has_w = m_ != I32MAX
                r_w = m_ >> 25
                # rows >= D_eff never produce valid cells (geo's live
                # mask), so r_w < D_eff whenever has_w
                V = M25 - (m_ & M25)
                r_s = jnp.minimum(jnp.where(has_w, r_w, BIG), am_)
                win_h = has_w & (r_w == r_s)
                anc_h = am_ == r_s
                capb = win_h & (V >= (1 << 24))
                sfb = win_h & ~capb
                lmax_ = (V >> 18) & 63
                brel_ = 511 - (V & 511)
                w[k]["pk"] = jnp.where(
                    r_s < BIG,
                    (r_s << 23)
                    + jnp.where(anc_h, 1 << 22, 0)
                    + jnp.where(sfb, (1 << 21) + (lmax_ << 15)
                                + (brel_ << 6), 0)
                    + jnp.where(capb, 1 << 5, 0),
                    BIG)
                w[k]["geo"] = geo[k]
                w[k]["tie"] = tie[k]
            return w

        def contest_one(k, w, dd, i_ev, pred_dd, sf_u, lmax_u, s_pos0):
            """v5 contest verbatim (rare path; serial per pair)."""
            dsz = dszs[k]
            b0 = w["b0"]
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

        # ---- the SIMT anchor resolve -------------------------------------
        def simt_anchor_all(i_evs, needs):
            """All K pairs resolve their anchor candidates in lockstep:
            one shared while loop; each iteration advances every live
            pair by one CH-lane LCE chunk of its current candidate.
            Per-pair semantics are exactly v5 resolve_anchor/exact_lce
            (candidates in poslist order; strict > keeps the first
            longest)."""
            pkcs = [vext_r(cand, k, i_evs[k]) for k in range(K)]
            los = [pkcs[k] >> 7 for k in range(K)]
            cnts = [jnp.where(needs[k], pkcs[k] & 127, 0)
                    for k in range(K)]
            pvecs = [align_load_r(poslist, 0, los[k], 128)
                     for k in range(K)]

            def cand_at(k, c, live):
                pc = pltpu.roll(pvecs[k], 128 - c, 1)[0, 0]
                pc = jnp.where(live, pc, 0)
                cap = jnp.where(
                    live, jnp.minimum(nr - pc, dszs[k] - i_evs[k]), 0)
                return pc, jnp.maximum(cap, 0)

            inits = []
            for k in range(K):
                live0 = cnts[k] > 0
                pc0, cap0 = cand_at(k, jnp.int32(0), live0)
                inits.extend([jnp.int32(0), jnp.int32(0), jnp.int32(0),
                              jnp.int32(0), pc0, cap0])

            def unpack(st):
                return [st[6 * k:6 * k + 6] for k in range(K)]

            def loop_cond(st):
                alive = None
                for k in range(K):
                    a = st[6 * k] < cnts[k]
                    alive = a if alive is None else (alive | a)
                return alive

            def loop_body(st):
                ps = unpack(st)
                lives = [ps[k][0] < cnts[k] for k in range(K)]
                # chunk loads — all pairs, alternated
                qbs = [align_load_r8(qbuf, k,
                                    jnp.where(lives[k],
                                              i_evs[k] + ps[k][1], 0),
                                    CH) for k in range(K)]
                rbs = [align_load_r8(refbuf, 0,
                                    jnp.where(lives[k],
                                              ps[k][4] + ps[k][1], 0),
                                    CH) for k in range(K)]
                # batched first-mismatch: ONE (K, CH) compare + lane-min
                # instead of K separate compares + K full reduces (round
                # 5: the ilv=16 profile put the anchor loop at +20.0%,
                # the top phase — op-issue count, not element count, is
                # the cost at this width)
                QA = jnp.concatenate(qbs, axis=0)
                RA = jnp.concatenate(rbs, axis=0)
                F = jnp.min(jnp.where(QA != RA, lane_iota(CH), CH),
                            axis=1, keepdims=True)
                fms = [F[k, 0] for k in range(K)]
                if "v7anchor" in PROF:  # double the LCE chunk round trip
                    qb2 = [align_load_r8(
                        qbuf, k, jnp.where(lives[k],
                                           i_evs[k] + ps[k][1] + z, 0),
                        CH) for k in range(K)]
                    QA2 = jnp.concatenate(qb2, axis=0)
                    F2 = jnp.min(jnp.where(QA2 != RA, lane_iota(CH), CH),
                                 axis=1, keepdims=True)
                    fms = [jnp.minimum(fms[k], F2[k, 0])
                           for k in range(K)]
                out = []
                for k in range(K):
                    c, off, blen, bpos, pc, cap = ps[k]
                    fm = fms[k]
                    ml = jnp.minimum(off + fm, cap)
                    cd = (fm < CH) | (off + CH >= cap)  # candidate done
                    fin = lives[k] & cd
                    take = fin & (ml > blen)
                    blen2 = jnp.where(take, ml, blen)
                    bpos2 = jnp.where(take, pc, bpos)
                    c2 = jnp.where(fin, c + 1, c)
                    off2 = jnp.where(lives[k],
                                     jnp.where(cd, 0, off + CH), off)
                    live2 = c2 < cnts[k]
                    pc_n, cap_n = cand_at(k, c2, live2)
                    pc2 = jnp.where(fin, pc_n, pc)
                    cap2 = jnp.where(fin, cap_n, cap)
                    out.extend([c2, off2, blen2, bpos2, pc2, cap2])
                return tuple(out)

            def loop_bodyN(st):
                for _ in range(AU):   # masked updates: double-step safe
                    st = loop_body(st)
                return st

            st = jax.lax.while_loop(loop_cond, loop_bodyN, tuple(inits))
            ps = unpack(st)
            return ([ps[k][2] for k in range(K)],
                    [ps[k][3] for k in range(K)])

        # ---- the predicated unified tail ----------------------------------
        def unified_tail(sts, ws, acts, syncs):
            dd = [None] * K
            has_anch = [None] * K
            sf_u = [None] * K
            lmax_u = [None] * K
            brel_u = [None] * K
            has_cap = [None] * K
            sync_att = [None] * K
            i_evs = [None] * K
            desy_att = [None] * K
            to_end = [None] * K
            js = [(vext_rw(next_hit, k, sts[k][0]) + 32768) if NH16
                  else vext_r(next_hit, k, sts[k][0])
                  for k in range(K)]
            if "v7probe" in PROF:  # double the next_hit scalar loads
                js2 = [(vext_rw(next_hit, k, sts[k][0] + z) + 32768)
                       if NH16 else vext_r(next_hit, k, sts[k][0] + z)
                       for k in range(K)]
                js = [jnp.minimum(js[k], js2[k]) for k in range(K)]
            for k in range(K):
                st = sts[k]
                if ws is not None:
                    pk = ws[k]["pk"]
                    sync_att[k] = syncs[k] & (pk != BIG)
                    dd[k] = pk >> 23
                    has_anch[k] = ((pk >> 22) & 1) > 0
                    sf_u[k] = ((pk >> 21) & 1) > 0
                    lmax_u[k] = (pk >> 15) & 63
                    brel_u[k] = (pk >> 6) & 511
                    has_cap[k] = ((pk >> 5) & 1) > 0
                    if "v7pkdec" in PROF:  # double the pk bit decode
                        pk2 = pk + z
                        dd[k] = jnp.minimum(dd[k], pk2 >> 23)
                        has_anch[k] = has_anch[k] & (
                            ((pk2 >> 22) & 1) > 0)
                        sf_u[k] = sf_u[k] & (((pk2 >> 21) & 1) > 0)
                        lmax_u[k] = jnp.minimum(lmax_u[k],
                                                (pk2 >> 15) & 63)
                        brel_u[k] = jnp.minimum(brel_u[k],
                                                (pk2 >> 6) & 511)
                        has_cap[k] = has_cap[k] & (((pk2 >> 5) & 1) > 0)
                else:
                    sync_att[k] = jnp.bool_(False)
                    dd[k] = jnp.int32(0)
                    has_anch[k] = jnp.bool_(False)
                    sf_u[k] = jnp.bool_(False)
                    lmax_u[k] = jnp.int32(0)
                    brel_u[k] = jnp.int32(0)
                    has_cap[k] = jnp.bool_(False)
                desy = acts[k] & ~syncs[k]
                desy_att[k] = desy & (js[k] < dszs[k] - msl)
                to_end[k] = desy & ~desy_att[k]
                i_evs[k] = jnp.where(syncs[k], sts[k][0] + dd[k], js[k])

            # seed candidate (+ rare contest escalation)
            s_len = [jnp.where(sf_u[k], lmax_u[k], 0) for k in range(K)]
            s_pos = [jnp.where(sf_u[k],
                               (ws[k]["b0"] + brel_u[k]) if ws is not None
                               else jnp.int32(0), 0) for k in range(K)]
            if ws is not None:
                any_cap = sync_att[0] & has_cap[0]
                for k in range(1, K):
                    any_cap = any_cap | (sync_att[k] & has_cap[k])

                def run_contests(sp):
                    sl, spp = list(sp[0]), list(sp[1])
                    for k in range(K):
                        def one(_, k=k):
                            return contest_one(
                                k, ws[k], dd[k], i_evs[k],
                                sts[k][1] + dd[k], sf_u[k], lmax_u[k],
                                s_pos[k])

                        sl[k], spp[k] = jax.lax.cond(
                            sync_att[k] & has_cap[k], one,
                            lambda _, k=k: (sl[k], spp[k]), None)
                    return tuple(sl), tuple(spp)

                s_len, s_pos = jax.lax.cond(
                    any_cap, run_contests, lambda sp: sp,
                    (tuple(s_len), tuple(s_pos)))
                s_len, s_pos = list(s_len), list(s_pos)

            # anchor resolve (SIMT; shared cond skips event-free iters)
            needs = [(sync_att[k] & has_anch[k]) | desy_att[k]
                     for k in range(K)]
            any_need = needs[0]
            for k in range(1, K):
                any_need = any_need | needs[k]
            a_len, a_pos = jax.lax.cond(
                any_need,
                lambda _: simt_anchor_all(i_evs, needs),
                lambda _: ([jnp.int32(0)] * K, [jnp.int32(0)] * K),
                None)

            # WIN arbitration — always-issued clamped probes
            take_a = [None] * K
            good = [None] * K
            bl = [None] * K
            bp = [None] * K
            for k in range(K):
                alc = jnp.minimum(a_len[k], SAT) - mal
                slc = jnp.minimum(s_len[k], SAT) - msl
                lr_ev = sts[k][2] + dd[k]
                widx = jnp.clip((alc * NS + slc) * NL + lr_ev,
                                0, WIDX_MAX)
                word = vext_r(win, 0, widx >> 5)
                arb = ((word >> (widx & 31)) & 1) > 0
                if "v7probe" in PROF:  # double the WIN table probe
                    word2 = vext_r(win, 0, (widx + z) >> 5)
                    arb = arb & (((word2 >> ((widx + z) & 31)) & 1) > 0)
                s_found = sf_u[k] | has_cap[k]
                ta = ((a_pos[k] != 0)
                      & (arb | ~(s_found & (s_pos[k] != 0))))
                take_a[k] = ta
                good_sync = sync_att[k] & (ta | s_found)
                good[k] = good_sync | desy_att[k]
                bl_s = jnp.where(ta, a_len[k], s_len[k])
                bp_s = jnp.where(ta, a_pos[k], s_pos[k])
                bl[k] = jnp.where(syncs[k], bl_s, a_len[k])
                bp[k] = jnp.where(syncs[k], bp_s, a_pos[k])

            any_good = good[0]
            for k in range(1, K):
                any_good = any_good | good[k]

            # apply_match, predicated across all K (shared cond skips
            # event-free iterations entirely)
            def apply_all(_):
                lit_ev = [sts[k][2] + (i_evs[k] - sts[k][0])
                          for k in range(K)]
                pred_ev = [sts[k][1] + (i_evs[k] - sts[k][0])
                           for k in range(K)]
                close = [(pred_ev[k] >= 0)
                         & (jnp.abs(bp[k] - pred_ev[k]) <= mrd)
                         for k in range(K)]
                tl = [None] * K
                need_bwd = [None] * K
                for k in range(K):
                    t = jnp.where(lit_ev[k] > 0, lit_ev[k], sts[k][5])
                    do_kill = ((sts[k][3] >= 0)
                               & (sts[k][4] - sts[k][3] < reg))
                    run_len = (i_evs[k] - sts[k][3]) + sts[k][6]
                    tl[k] = jnp.where(do_kill, run_len, t)
                    need_bwd[k] = good[k] & (~close[k]) & (tl[k] > 0)

                # --- backward ext: first chunks alternated + batched
                # matmul; rare multi-chunk rest in ONE lockstep loop
                b_tot = [jnp.where(
                    need_bwd[k],
                    jnp.minimum(jnp.minimum(i_evs[k], bp[k]), tl[k]), 0)
                    for k in range(K)]
                b_first = ext_first_all(i_evs, bp, b_tot, False)
                if "v7ext" in PROF:  # double the bwd first chunks
                    b2 = ext_first_all(i_evs, bp, b_tot, False, zoff=z)
                    b_first = [
                        (jnp.minimum(b_first[k][0], b2[k][0]),
                         b_first[k][1] & b2[k][1],
                         b_first[k][2], b_first[k][3])
                        for k in range(K)]
                b_live = [need_bwd[k] & ~b_first[k][1] & (b_tot[k] > 128)
                          for k in range(K)]
                any_bmore = b_live[0]
                for k in range(1, K):
                    any_bmore = any_bmore | b_live[k]

                bwd = jax.lax.cond(
                    any_bmore,
                    lambda _: ext_continue_all(b_live, i_evs, bp, b_tot,
                                               b_first, False),
                    lambda _: tuple(b_first[k][0] for k in range(K)),
                    None)
                bwd = [jnp.where(need_bwd[k], bwd[k], 0)
                       for k in range(K)]

                # --- forward ext: first chunks alternated + batched
                # matmul; rare multi-chunk rest in ONE lockstep loop
                i2 = [i_evs[k] + bl[k] for k in range(K)]
                pred2 = [bp[k] + bl[k] for k in range(K)]
                f_tot = [jnp.where(
                    good[k],
                    jnp.minimum(dszs[k] - i2[k], nr - pred2[k]), 0)
                    for k in range(K)]
                f_tot = [jnp.maximum(f_tot[k], 0) for k in range(K)]
                f_first = ext_first_all(i2, pred2, f_tot, True)
                if "v7ext" in PROF:  # double the fwd first chunks
                    f2 = ext_first_all(i2, pred2, f_tot, True, zoff=z)
                    f_first = [
                        (jnp.minimum(f_first[k][0], f2[k][0]),
                         f_first[k][1] & f2[k][1],
                         f_first[k][2], f_first[k][3])
                        for k in range(K)]
                f_live = [good[k] & ~f_first[k][1] & (f_tot[k] > CEFV)
                          for k in range(K)]
                any_fmore = f_live[0]
                for k in range(1, K):
                    any_fmore = any_fmore | f_live[k]

                ext = jax.lax.cond(
                    any_fmore,
                    lambda _: ext_continue_all(f_live, i2, pred2, f_tot,
                                               f_first, True),
                    lambda _: tuple(f_first[k][0] for k in range(K)),
                    None)
                ext = [jnp.where(good[k], ext[k], 0) for k in range(K)]

                # --- emission (always-store; see log_event)
                nes = []
                pends = []
                for k in range(K):
                    ne2, pend2 = log_event(
                        k, (sts[k][7], sts[k][8]), i_evs[k], bp[k],
                        bl[k], bwd[k], ext[k], good[k])
                    nes.append(ne2)
                    pends.append(pend2)

                # --- event outcome state
                out = []
                for k in range(K):
                    use_bwd = bwd[k] > 0
                    rl = jnp.where(use_bwd, i_evs[k] - bwd[k], i_evs[k])
                    lb = jnp.where(use_bwd, tl[k] - bwd[k], tl[k])
                    reg_lo2 = jnp.where(close[k], sts[k][3], rl)
                    lit_below2 = jnp.where(close[k], sts[k][6], lb)
                    i3 = i2[k] + ext[k]
                    pred3 = pred2[k] + ext[k]
                    out.append((i3, pred3, jnp.int32(0), reg_lo2, i3,
                                jnp.int32(0), lit_below2, nes[k],
                                pends[k], jnp.int32(0)))
                return tuple(out)

            def no_apply(_):
                return tuple(sts[k] for k in range(K))

            ev_states = jax.lax.cond(any_good, apply_all, no_apply, None)

            # ---- final per-pair outcome merge (selects) -----------------
            out = []
            for k in range(K):
                st = sts[k]
                dsz = dszs[k]
                # no-event window advance
                if ws is not None:
                    adv = ws[k]["D_eff"]
                    new_lr = st[2] + adv
                    desync = new_lr > mqd
                    noev = (st[0] + adv, jnp.where(desync, -dsz,
                                                   st[1] + adv),
                            new_lr, st[3], st[4], st[5], st[6], st[7],
                            st[8], jnp.int32(0))
                else:
                    noev = st
                # desync to-end jump
                delta = (dsz - msl) - st[0]
                endst = (st[0] + delta, st[1] + delta, st[2] + delta,
                         st[3], st[4], st[5], st[6], st[7], st[8],
                         jnp.int32(0))
                spurious = sync_att[k] & ~good[k]
                noev_m = syncs[k] & acts[k] & ~sync_att[k]
                slots = []
                for s in range(10):
                    v = jnp.where(
                        good[k], ev_states[k][s],
                        jnp.where(spurious,
                                  (dd[k] + 1) if s == 9 else st[s],
                                  jnp.where(noev_m, noev[s],
                                            jnp.where(to_end[k], endst[s],
                                                      st[s]))))
                    if "v7merge" in PROF:  # double the outcome selects
                        v2 = jnp.where(
                            good[k], ev_states[k][s],
                            jnp.where(spurious,
                                      (dd[k] + 1 + z) if s == 9
                                      else st[s] + z,
                                      jnp.where(noev_m, noev[s] + z,
                                                jnp.where(to_end[k],
                                                          endst[s] + z,
                                                          st[s] + z))))
                        v = jnp.minimum(v, v2)
                    slots.append(v)
                out.append(tuple(slots))
            return tuple(out)

        # ---- the lockstep loop --------------------------------------------
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
                ws = window_phase_all(sts)
                return unified_tail(sts, ws, acts, syncs)

            def desync_branch(sts):
                return unified_tail(sts, None, acts, syncs)

            return jax.lax.cond(any_sync, win_branch, desync_branch, sts)

        def bodyN(sts):
            for _ in range(MU):   # masked supersteps: double-step safe
                sts = body(sts)
            return sts

        init = tuple(
            (jnp.int32(0), -dszs[k], jnp.int32(0), jnp.int32(-1),
             jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
             jnp.zeros((1, 128), I32), jnp.int32(0))
            for k in range(K))
        finals = jax.lax.while_loop(loop_cond, bodyN, init)

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
