"""Pallas TPU kernel for the LZ-ANI greedy parse — event-log architecture.

The kernel reproduces the reference parser's *decision stream*: one record
per accepted match {i_ev, best_pos, best_len, bwd, ext}. The host replays
the stream through the native emission machinery (lza_replay_finalize),
which cross-checks bwd/ext and rebuilds factors/stats/regions exactly
(tests/test_event_replay.py proves the contract closed-loop).

Search semantics implemented TPU-first (see ops/DESIGN.md):
  * synced seed search  = dense band LCE matrix over the prediction window
    (binary-lifting diagonal doubling), replacing ht_short buckets
    (reference parser.cpp:548-580) — identical winners and tie-breaks
  * anchor search       = host-precomputed direct-address join over 11-mers
    (candidate ranges); in-kernel per-candidate exact extension replaces
    ht_long probing (parser.cpp:507-531); smallest-position tie-break
  * anchor-vs-seed      = exact boolean WIN table (ops/anchor_tables.py)
    replacing the f64 fpow comparison (parser.cpp:604-623)
  * approx extensions   = chunked vectorized sliding-window scans
    (parser.cpp:377-441), windowed sums via lane-shift cumsum

All device compute is int32/int8/f32 — no x64 anywhere in the kernel.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .anchor_tables import (SAT, build_anchor_join, build_win_table,
                            kmer_stream_np)
# hybrid scheduler + jax-free host helpers live in ops/hybrid.py (so the
# CLI's default backend can start without paying this module's ~1.4 s
# pallas/Mosaic import); re-exported here for back-compat
from .hybrid import (_make_finalize, _native_row,  # noqa: F401
                     _restore_priority, _thread_idle_priority,
                     all2all_hybrid)
from .parse import ParseCfg
from .prep import SYM_N_REF, SYM_N_SEQ, query_buffer_np, ref_buffer_np

I32 = jnp.int32
BIG = (1 << 30)  # python int: avoids captured-constant tracing in pallas

CAP = 32          # band LCE cap (level-1); longer runs escalate to exact
CAP2 = 512        # escalation strip depth per round
QROWS = 80        # v4 band matrix rows  (>= D-1 + CAP = 72 at defaults)
RCOLS = 256       # v4 band matrix cols  (>= W-1 + CAP = 206 at defaults)
WROWS = 80        # v3 window rows (<= 128: one aligned query load)
WCOLS = 256       # v3 window cols
# Window sizing (measured, round 2): a (128, 384) window chained only
# 1.07 events/window on vir61 (median event advance exceeds any viable
# row margin), while its 2.25x tiles made every per-iteration mask op
# ~50% dearer — net neutral. (80, 256) keeps the op costs at the flat
# per-op floor; the chain loop structure remains (it costs nothing when
# it exits after one event, and still serves spurious-anchor retries and
# the small-advance chains that do fit).
CH = 512          # chunk for exact-LCE / extension scans
EV_STRIDE = 8     # int32 per event record


def device_envelope_reason(params) -> str | None:
    """Human-readable reason when a parameter set falls outside the
    compiled device-kernel envelope (the make_parse_kernel factory
    asserts), or None when the device path is legal. The reference
    parser has no such limits (parser.cpp:16-34 is unbounded), so
    callers fall back to the native engine instead of erroring."""
    cfg = ParseCfg.from_params(params)
    D = cfg.mqd + 1
    W = cfg.mqd + cfg.mrd
    msl_eff = min(cfg.msl, CAP)
    if max(cfg.mqd, cfg.mrd) > 127:
        return (f"max ref/query distance > 127 (mrd={cfg.mrd}, "
                f"mqd={cfg.mqd}) exceeds the 7-bit tie-pack field")
    if D + msl_eff > WROWS or W + D + msl_eff > WCOLS:
        return (f"window geometry needs ({D + msl_eff},"
                f"{W + D + msl_eff}) > compiled ({WROWS},{WCOLS}) band "
                f"(mqd={cfg.mqd}, mrd={cfg.mrd}, msl={cfg.msl})")
    if not (1 <= cfg.aw <= 128 and 0 <= cfg.ar <= 128):
        return (f"approx-extension params outside the 128-lane chunk "
                f"(aw={cfg.aw}, ar={cfg.ar})")
    if cfg.mal > 30:
        return (f"min anchor length {cfg.mal} > 30: anchors no longer "
                f"fit two 30-bit sort keys")
    return None


# ---------------------------------------------------------------------------
# small vector helpers (all Mosaic-friendly: aligned loads + rolls + shifts)
# ---------------------------------------------------------------------------

def align_load(ref, p, n):
    """(1, n) slice of row 0 at dynamic offset p >= 0; n multiple of 128."""
    base = (p // 128) * 128
    rem = p - base
    m = n + 128
    blk = ref[0:1, pl.ds(pl.multiple_of(base, 128), m)]
    return pltpu.roll(blk, m - rem, 1)[0:1, :n]


def vext(ref, p):
    """Scalar ref[0, p] for dynamic p (VMEM-legal: aligned load + roll)."""
    base = (p // 128) * 128
    rem = p - base
    blk = ref[0:1, pl.ds(pl.multiple_of(base, 128), 128)]
    return pltpu.roll(blk, 128 - rem, 1)[0, 0]


def to_col(vrow, eye):
    """(1, 128) -> (128, 1) without a transpose op: contract with the
    resident identity matrix via dot_general (exact for values < 2^24)."""
    out = jax.lax.dot_general(eye, vrow.astype(jnp.float32),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(I32)  # (128, 1)


def reverse_lanes(vrow, anti):
    """(1, 128) lane reversal via the resident anti-identity MXU
    contraction (no lane-permute gather needed; exact for values < 2^24)."""
    out = jax.lax.dot_general(vrow.astype(jnp.float32), anti,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(I32)  # (1, n), out[0, j] = vrow[0, n-1-j]


def _dshift(M, step, ri, ci):
    """out[i, j] = M[i+step, j+step], zero-filled — via circular rolls +
    masking (Mosaic rejects pad/concat of offset layouts). ri/ci are the
    (R, C) row/col iotas (hoisted by the caller)."""
    R, C = M.shape
    M2 = pltpu.roll(pltpu.roll(M, R - step, 0), C - step, 1)
    return jnp.where((ri < R - step) & (ci < C - step), M2, 0)


def run_detect(E, m, ri, ci):
    """A[a,b] = 1 iff the diagonal run of 1s from (a,b) is >= m — the cheap
    seed pre-test (3-4 shifted ANDs instead of a full capped LCE)."""
    A = E
    P = 1
    while P * 2 <= m:
        A = A * _dshift(A, P, ri, ci)
        P *= 2
    if m > P:
        A = A * _dshift(A, m - P, ri, ci)
    return A


def diag_lce(E, cap, ri, ci):
    """S[a,b] = min(cap, run of 1s along the diagonal from (a,b)) via
    saturation doubling: S_2n = S_n + (S_n == n) * shift(S_n, n). The
    S == step test doubles as the old run-continuation matrix A, halving
    the per-round tile ops. cap = power of two."""
    S = E
    step = 1
    while step < cap:
        R, C = E.shape
        M2 = pltpu.roll(pltpu.roll(S, R - step, 0), C - step, 1)
        take = (S == step) & (ri < R - step) & (ci < C - step)
        S = S + jnp.where(take, M2, 0)
        step *= 2
    return S


def lane_iota(n):
    return jax.lax.broadcasted_iota(I32, (1, n), 1)


def align_load_r(ref, row, p, n):
    """(1, n) slice of row `row` at dynamic offset p >= 0; n mult of 128.
    Mosaic requires 128-aligned dynamic lane offsets: load the aligned
    superset and roll (shared by the v5/v7 K-pair kernels)."""
    base = (p // 128) * 128
    rem = p - base
    m = n + 128
    blk = ref[row:row + 1, pl.ds(pl.multiple_of(base, 128), m)]
    return pltpu.roll(blk, m - rem, 1)[0:1, :n]


def align_load_r8(ref, row, p, n):
    """align_load_r for an int8-resident buffer: slice the aligned i8
    superset, WIDEN to i32, then roll — this target supports i8 dynamic
    slices and i8->i32 extension but neither rotate nor compare on
    non-32-bit vectors (probed round 5). Storage stays 1 B/symbol in
    VMEM; transient registers widen as before."""
    base = (p // 128) * 128
    rem = p - base
    m = n + 128
    blk = ref[row:row + 1, pl.ds(pl.multiple_of(base, 128), m)]
    return pltpu.roll(blk.astype(I32), m - rem, 1)[0:1, :n]


def vext_r(ref, row, p):
    """Scalar ref[row, p] for dynamic p (aligned load + roll)."""
    base = (p // 128) * 128
    rem = p - base
    blk = ref[row:row + 1, pl.ds(pl.multiple_of(base, 128), 128)]
    return pltpu.roll(blk, 128 - rem, 1)[0, 0]


def vext_rw(ref, row, p):
    """vext_r for a sub-32-bit-resident buffer: widen the aligned block
    to i32 BEFORE the roll (no rotate on non-32-bit vectors on this
    target)."""
    base = (p // 128) * 128
    rem = p - base
    blk = ref[row:row + 1, pl.ds(pl.multiple_of(base, 128), 128)]
    return pltpu.roll(blk.astype(I32), 128 - rem, 1)[0, 0]


def pack3_rows(codes: np.ndarray) -> np.ndarray:
    """(R, L) uint8 codes (values 0..5) -> (R, ceil(L/3)) radix-216 bytes,
    the io/packing.py three-in-byte layout (reference seq_reservoir.h
    3-per-byte density) applied row-wise. Used to cut host->device
    transfer and device-resident bytes to 1/3 B per symbol; the engines
    expand to int32 on device per dispatch (transient scratch)."""
    R, L = codes.shape
    Lp = -(-L // 3)
    c = np.zeros((R, Lp * 3), np.uint16)
    c[:, :L] = codes
    c = c.reshape(R, Lp, 3)
    return (c[:, :, 0] * 36 + c[:, :, 1] * 6 + c[:, :, 2]).astype(np.uint8)


def dev_unpack3(packed, L):
    """(R, Lp) radix-216 bytes -> (R, L) int32 codes on device."""
    p = packed.astype(jnp.int32)
    d0 = p // 36
    d1 = (p // 6) % 6
    d2 = p % 6
    out = jnp.stack([d0, d1, d2], axis=-1).reshape(p.shape[0], -1)
    return out[:, :L]


def pack_bits_i32(bits: np.ndarray, pad_words: int) -> np.ndarray:
    """0/1 array -> (1, W) int32 bit-words (little-endian within a word),
    W padded to `pad_words` multiples of 128. The WIN arbitration table
    ships as bits (32x fewer upload bytes per reference)."""
    b = np.asarray(bits, np.uint8).reshape(-1)
    n_words = -(-len(b) // 32)
    W = -(-max(n_words, 1) // pad_words) * pad_words
    padded = np.zeros(W * 32, np.uint8)
    padded[:len(b)] = b
    words = (padded.reshape(W, 32).astype(np.uint32)
             << np.arange(32, dtype=np.uint32)).sum(1, dtype=np.uint32)
    return words.view(np.int32).reshape(1, W)


CEF = 512  # forward ext_scan chunk width (lanes per loop iteration)


def build_const_mat2(aw: int, ar: int, ce: int = CEF) -> np.ndarray:
    """Forward ext_scan banded matrices at the chunk width ce:
    (ce, 2*ce) f32 — [:, :ce) the aw-window band, [:, ce:) the
    ar-window band; B[k, e] = 1 iff e-width < k <= e. Vector ops below
    ~(128,256) are priced per-op, not per-element (measured round 2), so
    a (1,512) chunk costs the same per iteration as (1,128) and scans 4x
    the symbols. Ships as an XLA constant inside the dispatch jit; the
    sim path ships it at the production cef (256), saving 1.5 MB of the
    16 MB VMEM budget vs the (512,1024) block."""
    k = np.arange(ce)[:, None]
    e = np.arange(ce)[None, :]
    baw = (e - aw < k) & (k <= e)
    bar = (e - ar < k) & (k <= e)
    return np.concatenate([baw, bar], axis=1).astype(np.float32)


def build_const_mat(aw: int, ar: int) -> np.ndarray:
    """Kernel-resident constant matrices, one (128, 512) f32 block:
      [:, 0:128)   identity           (to_col)
      [:, 128:256) anti-identity      (reverse_lanes)
      [:, 256:384) aw-banded window   (ext_scan bad-count matmul)
      [:, 384:512) ar-banded window   (ext_scan run-test matmul)
    B[k, e] = 1 iff e-width < k <= e: one MXU contraction computes the
    sliding-window mismatch sums that previously took ~20 VPU shift-adds."""
    k = np.arange(128)[:, None]
    e = np.arange(128)[None, :]
    eye = k == e
    anti = k + e == 127
    baw = (e - aw < k) & (k <= e)
    bar = (e - ar < k) & (k <= e)
    return np.concatenate([eye, anti, baw, bar], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# kernel factory
# ---------------------------------------------------------------------------

#: PROFILING-ONLY phase-doubling hooks (scripts/profile_kernel_inner.py):
#: each named phase is computed twice — the second copy perturbed by a
#: runtime zero (scal lane 7) so XLA/Mosaic cannot CSE it — and combined
#: with jnp.minimum (bit-identical result). The phase's true cost is then
#: (flagged kernel) - (base kernel) on the same workload. Always empty in
#: production; the hooks trace to nothing when unset.
PROF_DOUBLE: frozenset = frozenset()

#: When True, the kernel threads superstep/desync counters through the
#: parse loops and writes them to the event-buffer tail block (read by
#: scripts/profile_kernel_phases.py). Off in production: the counters
#: add two scalars to the state every loop/cond boundary crosses.
PROF_COUNTERS: bool = False


def make_parse_kernel(cfg: ParseCfg, LrP: int, LqP: int, KaP: int,
                      WinP: int, EvL: int, big: bool = False):
    """big=True builds the long-genome variant: refbuf/qbuf/poslist/
    cand/next_hit/ev_out live in HBM (pl.ANY) instead of VMEM blocks —
    megabase references (reference parser.cpp:16-34 is unbounded) exceed
    the ~16 MB VMEM budget ~64x at 10 Mb. Every dynamic load becomes an
    HBM->VMEM DMA round trip (625 ns measured vs ~280 ns VMEM —
    scripts/calibrate_round3.py Q4); q/r load pairs overlap their DMAs.
    The q-side buffers are indexed by pl.program_id(0) (ANY refs are not
    grid-blocked); event flushes DMA the pending block out. Same
    automaton, same event log, byte-exact vs the small kernel."""
    MAXEV = EvL // 128 * 16  # event capacity of the output buffer
    mal, msl, mrd, mqd = cfg.mal, cfg.msl, cfg.mrd, cfg.mqd
    reg, aw, am, ar = cfg.reg, cfg.aw, cfg.am, cfg.ar
    D = mqd + 1                      # max future positions per superstep
    W = mqd + mrd                    # band width (window offsets)
    NL = mqd + 1                     # WIN table lr entries
    NS = SAT - msl + 1               # WIN table sl entries
    msl_eff = min(msl, CAP)
    # chained-window legality: every geo-valid cell keeps >= msl_eff of
    # diagonal runway inside the (WROWS, WCOLS) matrix, so a true seed is
    # never truncated below the validity threshold; cells whose measured
    # run reaches min(CAP, edge) are re-contested exactly (see Scap).
    assert D + msl_eff <= WROWS, (D, msl_eff)
    assert W + D + msl_eff <= WCOLS, (W, D, msl_eff)
    assert max(mqd, mrd) <= 127      # dist fits the 7-bit tie-pack field
    # ext_scan envelope: the banded window matrices and the tail carry
    # cover at most one 128-lane chunk; the in-loop run0 derivation also
    # relies on min(run0_prev + CE, ar) == ar, i.e. ar <= CE = 128
    assert 1 <= aw <= 128 and 0 <= ar <= 128, (aw, ar)

    # ---------------- in-kernel helpers bound to refs ---------------------

    def exact_lce(pld, qs, rs, cap):
        """Exact LCE between q[qs:] and r[rs:], bounded by cap (which must
        itself bound both buffers; padding symbols differ, so runs always
        terminate before the pads run out). pld(qp, rp, n) loads the
        (1, n) q/r rows (VMEM slice or paired HBM DMA)."""

        def body(st):
            off, _ = st
            qb, rb = pld(qs + off, rs + off, CH)
            neq = (qb != rb).astype(I32)
            # first mismatch position in this chunk (CH if none)
            fm = jnp.min(jnp.where(neq > 0, lane_iota(CH), CH))
            return off + CH, fm

        def cond(st):
            off, fm = st
            return (fm == CH) & (off < cap)

        # run at least once
        off, fm = body((jnp.int32(0), jnp.int32(CH)))
        off, fm = jax.lax.while_loop(cond, lambda st: body(st), (off, fm))
        return jnp.minimum(off - CH + fm, cap)

    def ext_scan(pld, cmat, cmat2, dpos, rpos, cap, max_len,
                 forward):
        """The approximate sliding-window extension (parser.cpp:377-441),
        exact semantics, vectorized per chunk. The two sliding-window
        mismatch counts (aw-window "bad" and ar-window run test) come from
        ONE MXU contraction against the resident banded matrices.

        forward: e-th symbols are q[dpos+e], r[rpos+e]; else q[dpos-1-e],
        r[rpos-1-e]. cap = positional bound (min over buffer edges);
        max_len = extra bound (backward: the literal length; BIG forward).
        Returns the reference scan's `last`.

        Chunk shape (measured, round 2 — ext_scan is ~25-30% of a vir61
        dispatch, and its cost is the per-OP overhead of the ~20 small
        vector ops per chunk, not elements and not scalar syncs): the
        forward path runs CEF=512-lane chunks against the wide banded
        matrices (same op count per iteration, 4x the symbols); the rare
        backward path (bounded by the pending literal) keeps 128 lanes,
        which its lane-reversal trick needs. Inter-chunk carries (ar-run,
        aw-tail, stop flag) stay vector-side; one VREG->SREG sync per
        chunk.
        """
        total = jnp.minimum(cap, max_len)
        CE = CEF if forward else 128
        LqS = LqP
        LrS = LrP
        io = lane_iota(CE)

        def load_miss(base):
            # overshooting sub-chunks (base >= total) read clamped
            # in-bounds garbage; their lanes are all masked invalid
            if forward:
                qo = jnp.clip(dpos + base, 0, LqS - CE - 128)
                ro = jnp.clip(rpos + base, 0, LrS - CE - 128)
                qb, rb = pld(qo, ro, CE)
                return (qb != rb).astype(I32)   # lane j -> e = base + j
            # e = base + j needs q[dpos-1-base-j]; load the ascending
            # blocks ending at dpos-base / rpos-base, reverse lanes,
            # then roll so that lane j lines up with e = base + j.
            # When fewer than CE symbols remain before the buffer
            # start, shift both loads consistently by `sh`.
            sq = dpos - base - CE
            sr = rpos - base - CE
            sh = jnp.clip(jnp.maximum(-sq, -sr), 0, CE)
            qb, rb = pld(jnp.clip(sq + sh, 0, LqS - CE - 128),
                         jnp.clip(sr + sh, 0, LrS - CE - 128), CE)
            m0 = (qb != rb).astype(I32)     # lane j -> e = base+CE-1-sh-j
            mr = reverse_lanes(m0, cmat[:, 128:256])
            # lanes j >= CE - sh wrapped around; they are beyond the
            # positional cap (total <= min(dpos, rpos) <= base+CE-sh)
            # and get masked by nv in the caller.
            return pltpu.roll(mr, CE - sh, 1)  # lane j -> e = base+j

        def win_sums(m_eff):
            """Windowed mismatch sums via MXU: W2[0, e] = bad(e) (aw
            window), W2[0, CE+e] = miss count in the ar window ending
            at e."""
            return jax.lax.dot_general(
                m_eff.astype(jnp.float32),
                cmat2[:, :] if forward else cmat[:, 256:512],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(I32)

        # --- peeled first chunk (the ext == 0 majority never enters the
        # loop). Specialized carries (measured round 2: the carry
        # machinery was ~half the per-event ext cost and is dead in the
        # first chunk): tail = 0 -> no suffix-sum chain; run0 = ar ->
        # extra = max(-1 - io, 0) = 0.
        nv = jnp.minimum(total, CE)
        miss = load_miss(jnp.int32(0))
        valid = io < nv
        m_eff = jnp.where(valid, miss, 0)
        W2 = win_sums(m_eff)
        stop = valid & (W2[:, 0:CE] > am)
        # "before the first stop": e < (first stop index)
        fs = jnp.min(jnp.where(stop, io, CE), axis=1, keepdims=True)
        # run(e) >= ar  <=>  no miss in the ar-window ending at e
        ok = (valid & (m_eff == 0) & (W2[:, CE:2 * CE] == 0)
              & (io < fs))  # m_eff==0: ar == 0 case
        last_v = jnp.where(ok, io + 1, 0)
        # ONE packed VREG->SREG sync serves both the loop-entry test and
        # the (majority) single-chunk result: fs, last <= CE <= 512
        P = fs * 1024 + jnp.max(last_v, axis=1, keepdims=True)
        p_sc = P[0, 0]
        last_sc = p_sc % 1024
        done_sc = (p_sc // 1024 < CE) | (nv < CE)

        def big_body(st):
            base, m_prev, last_v, _ = st
            # carries derived here from the PREVIOUS chunk's miss vector
            # (rare path; inside the loop the previous chunk was always
            # full: nv_prev == CE, so run0 = ar when it ended clean)
            lm = jnp.max(jnp.where(m_prev > 0, io, -1), axis=1,
                         keepdims=True)
            # last in-chunk miss -> edge run clamped at ar (only its
            # >= ar-ness matters onward)
            run0v = jnp.where(lm >= 0, jnp.minimum(CE - 1 - lm, ar),
                              jnp.int32(ar))
            # tail: miss at e = base-(aw-1)+k -> lane k
            tail = pltpu.roll(m_prev, aw - 1, 1)
            tail = jnp.where(io <= aw - 2, tail, 0)

            nv = jnp.minimum(total - base, CE)
            miss = load_miss(base)
            valid = io < nv
            m_eff = jnp.where(valid, miss, 0)
            W2 = win_sums(m_eff)
            # bad(e) carry: tail holds miss for e = base-(aw-1)..base-1
            # in lanes 0..aw-2; contribution to window(e=base+el) is the
            # tail suffix sum at el
            sufs = tail
            for stp in (1, 2, 4, 8):
                sufs = sufs + jnp.where(io < CE - stp,
                                        pltpu.roll(sufs, CE - stp, 1), 0)
            bad = W2[:, 0:CE] + jnp.where(io <= aw - 2, sufs, 0)
            stop = valid & (bad > am)
            fs = jnp.min(jnp.where(stop, io, CE), axis=1, keepdims=True)
            # positions before the chunk count as matches up to run0
            # then a virtual mismatch (the old lm >= -(run0+1) floor)
            extra = jnp.maximum((ar - 1 - run0v) - io, 0)
            ok = (valid & (m_eff == 0) & ((W2[:, CE:2 * CE] + extra) == 0)
                  & (io < fs))
            last_v = jnp.maximum(last_v, jnp.where(ok, base + io + 1, 0))
            done_sc = (fs[0, 0] < CE) | (nv < CE)
            return (base + CE, m_eff, last_v, done_sc)

        def big_cond(st):
            base, _, _, done_sc = st
            return (~done_sc) & (base < total)

        st = (jnp.int32(CE), m_eff, last_v, done_sc)
        st = jax.lax.while_loop(big_cond, big_body, st)
        # loop untaken (the common case): the peel's packed sync already
        # holds the answer; only a taken loop pays a second reduce+sync
        return jax.lax.cond(st[0] > CE, lambda _: jnp.max(st[2]),
                            lambda _: last_sc, None)

    # ---------------- the kernel itself ------------------------------------

    def kernel(scal_ref, refbuf, qbuf, poslist, cand, next_hit, win, cmat,
               cmat2, ev_out, nev_out, *scratch):
        dsz = scal_ref[0, 0]
        nr = scal_ref[0, 1]
        # runtime zero for the PROF_DOUBLE hooks (scal lanes >= 2 ship 0)
        z = scal_ref[0, 7]

        # ---- load primitives: VMEM slices (small) or HBM DMA (big) -------
        if big:
            s0, s1, s2, evs, sem0, sem1, sem2, sem3 = scratch
            qb_row = pl.program_id(0)  # ANY refs are not grid-blocked

            def _start(ref, row, p, m, scr, sem):
                # q-side buffers are (R, 1, L): the dynamic row is a pure
                # batch index (Mosaic rejects 1-row dynamic slices of 2D
                # HBM arrays — sublane tiling); shared (1, L) buffers
                # slice their only row statically
                base = (p // 128) * 128
                col = pl.ds(pl.multiple_of(base, 128), m)
                src = (ref.at[row, 0:1, col] if len(ref.shape) == 3
                       else ref.at[0:1, col])
                cp = pltpu.make_async_copy(src, scr.at[0:1, 0:m], sem)
                cp.start()
                return cp, p - base

            def _ald(ref, row, p, n, scr, sem):
                m = n + 128
                cp, rem = _start(ref, row, p, m, scr, sem)
                cp.wait()
                return pltpu.roll(scr[0:1, 0:m], m - rem, 1)[0:1, :n]

            def pld(qp, rp, n):
                # paired q/r fetch: both DMAs in flight before either
                # wait (independent round trips overlap ~fully, Q3)
                m = n + 128
                cq, remq = _start(qbuf, qb_row, qp, m, s0, sem0)
                cr, remr = _start(refbuf, 0, rp, m, s1, sem1)
                cq.wait()
                cr.wait()
                return (pltpu.roll(s0[0:1, 0:m], m - remq, 1)[0:1, :n],
                        pltpu.roll(s1[0:1, 0:m], m - remr, 1)[0:1, :n])

            def pld2(qp, rp):
                # the window's asymmetric q(128)/r(WCOLS) pair
                mq, mr = 256, WCOLS + 128
                cq, remq = _start(qbuf, qb_row, qp, mq, s0, sem0)
                cr, remr = _start(refbuf, 0, rp, mr, s1, sem1)
                cq.wait()
                cr.wait()
                return (pltpu.roll(s0[0:1, 0:mq], mq - remq, 1)[0:1, :128],
                        pltpu.roll(s1[0:1, 0:mr], mr - remr,
                                   1)[0:1, :WCOLS])

            def ld_pos(p, n):
                return _ald(poslist, 0, p, n, s2, sem2)

            def ld_cand(p, n):
                # anchor-presence probe: the count plane (row 2b+1) of
                # the two-plane big candidate table
                return _ald(cand, 2 * qb_row + 1, p, n, s2, sem2)

            def vx_nh(p):
                return _ald(next_hit, qb_row, p, 128, s2, sem2)[0, 0]

            def ev_store(blk, pend):
                # pend (VREG) -> VMEM staging -> HBM DMA at the block slot
                evs[0:1, :] = pend
                cp = pltpu.make_async_copy(
                    evs, ev_out.at[qb_row, 0:1,
                                   pl.ds(pl.multiple_of(blk * 128, 128),
                                         128)], sem3)
                cp.start()
                cp.wait()
        else:
            def pld(qp, rp, n):
                return align_load(qbuf, qp, n), align_load(refbuf, rp, n)

            def pld2(qp, rp):
                return (align_load(qbuf, qp, 128),
                        align_load(refbuf, rp, WCOLS))

            def ld_pos(p, n):
                return align_load(poslist, p, n)

            def ld_cand(p, n):
                return align_load(cand, p, n)

            def vx_cand(p):
                return vext(cand, p)

            def vx_nh(p):
                return vext(next_hit, p)

            def ev_store(blk, pend):
                ev_out[0:1,
                       pl.ds(pl.multiple_of(blk * 128, 128), 128)] = pend

        def _anchor_scan(jpos, lo, cnt):
            """Best (len, pos) over candidates poslist[lo : lo+cnt] —
            ht_long semantics: exact lengths, first-in-list (= smallest
            position; the list is sorted by (kmer, pos)) wins ties
            (strict >). The reference's hash probe admits collisions and
            filters them with the exact-LCE >= mal test
            (parser.cpp:518-531); filter survivors are exactly the true
            same-kmer candidates in insertion (= ascending-position)
            order, which this sorted list reproduces."""

            def run(_):
                def blk(bk, acc):
                    pvec = ld_pos(lo + bk * 128, 128)
                    nin = jnp.minimum(cnt - bk * 128, 128)

                    def body(c, st):
                        blen, bpos = st
                        pc = pltpu.roll(pvec, 128 - c, 1)[0, 0]
                        ml = exact_lce(pld, jpos, pc,
                                       jnp.minimum(nr - pc, dsz - jpos))
                        take = ml > blen
                        return (jnp.where(take, ml, blen),
                                jnp.where(take, pc, bpos))

                    return jax.lax.fori_loop(0, nin, body, acc)

                if big:
                    return jax.lax.fori_loop(
                        0, (cnt + 127) // 128, blk,
                        (jnp.int32(0), jnp.int32(0)))
                # small path: counts are capped at CNT_CAP <= 112 by the
                # prep overflow gate, so one 128-lane block suffices
                return blk(jnp.int32(0), (jnp.int32(0), jnp.int32(0)))

            return jax.lax.cond(cnt > 0, run,
                                lambda _: (jnp.int32(0), jnp.int32(0)),
                                None)

        if big:
            def resolve_anchor(jpos):
                # two-plane candidate table (rows 2b / 2b+1 of `cand`):
                # start index + unbounded count (no 7-bit pack, no
                # CNT_CAP fallback — reference parity for repeat-heavy
                # megabase genomes)
                lo = _ald(cand, 2 * qb_row, jpos, 128, s2, sem2)[0, 0]
                cnt = _ald(cand, 2 * qb_row + 1, jpos, 128, s2,
                           sem2)[0, 0]
                return _anchor_scan(jpos, lo, cnt)
        else:
            def resolve_anchor(jpos):
                # packed (start << 7 | count): one dynamic load per probe
                pk = vx_cand(jpos)
                return _anchor_scan(jpos, pk >> 7, pk & 127)

        def resolve_anchor_p(jpos):
            al, ap = resolve_anchor(jpos)
            if "anchor" in PROF_DOUBLE:
                al2, ap2 = resolve_anchor(jpos + z)
                al, ap = jnp.minimum(al, al2), jnp.minimum(ap, ap2)
            return al, ap

        def log_event(st, i_ev, bpos, blen, bwd, ext):
            # NB an unconditional per-event store (no flush cond)
            # measured SLOWER: the dynamic-offset VMEM store per event
            # outprices the 1-in-16 cond boundary it replaces.
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
                ev_store((ne // 16) - 1, pend)
                return jnp.zeros((1, 128), I32)

            pend = jax.lax.cond(ne % 16 == 0, flush, lambda p: p, pend)
            return ne, pend

        def apply_match(state, i_ev, bpos, blen):
            """Shared match application: updates scalar state, computes
            bwd/ext, logs the event. Mirrors parser.cpp:626-697 via the
            scalar-tracking argument (ops/DESIGN.md)."""
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, *prof) = state
            if "conds" in PROF_DOUBLE:
                # 4 no-op scalar branches per event: measures Mosaic's
                # per-lax.cond overhead (pipeline boundary), which the
                # phase-doubling hooks cannot see
                for _ in range(4):
                    i_ev = jax.lax.cond(z > 0, lambda _: i_ev + 1,
                                        lambda _: i_ev, None)
            lit_ev = lit_run + (i_ev - i)
            pred_ev = pred + (i_ev - i)

            close = (pred_ev >= 0) & (jnp.abs(bpos - pred_ev) <= mrd)

            # close: gap + CLOSE emission, reg state untouched, top is
            # CLOSE. distant: effective top-literal at bwd-check time =
            # flush, then kill replacement (ops/DESIGN.md scalar-tracking
            # argument), then backward extension into it. Both branches
            # are scalar selects except the bwd scan, which keeps the
            # ONLY lax.cond (cond boundaries are the expensive currency
            # here — see DESIGN.md round-2 notes).
            tl = jnp.where(lit_ev > 0, lit_ev, top_lit)
            do_kill = (reg_lo >= 0) & (reg_hi - reg_lo < reg)
            run_len = (i_ev - reg_lo) + lit_below
            tl = jnp.where(do_kill, run_len, tl)

            def _bwd(_):
                b = ext_scan(pld, cmat, cmat2, i_ev, bpos,
                             jnp.minimum(i_ev, bpos), tl,
                             forward=False)
                if "ext" in PROF_DOUBLE:
                    b = jnp.minimum(
                        b, ext_scan(pld, cmat, cmat2,
                                    i_ev + z, bpos + z,
                                    jnp.minimum(i_ev, bpos),
                                    tl, forward=False))
                return b

            bwd = jax.lax.cond((~close) & (tl > 0), _bwd,
                               lambda _: jnp.int32(0), None)
            use_bwd = bwd > 0               # implies ~close (bwd==0 else)
            rl = jnp.where(use_bwd, i_ev - bwd, i_ev)
            lb = jnp.where(use_bwd, tl - bwd, tl)
            reg_lo2 = jnp.where(close, reg_lo, rl)
            reg_hi2 = reg_hi
            top_lit2 = jnp.int32(0)
            lit_below2 = jnp.where(close, lit_below, lb)

            i2 = i_ev + blen
            pred2 = bpos + blen
            ext = ext_scan(pld, cmat, cmat2, i2, pred2,
                           jnp.minimum(dsz - i2, nr - pred2), BIG,
                           forward=True)
            if "ext" in PROF_DOUBLE:
                ext = jnp.minimum(
                    ext, ext_scan(pld, cmat, cmat2, i2 + z,
                                  pred2 + z,
                                  jnp.minimum(dsz - i2, nr - pred2), BIG,
                                  forward=True))
            ne2, pend2 = log_event((ne, pend), i_ev, bpos, blen, bwd, ext)
            i3 = i2 + ext
            pred3 = pred2 + ext
            return (i3, pred3, jnp.int32(0), reg_lo2, i3, top_lit2,
                    lit_below2, ne2, pend2, *prof)

        # ---------------- desync step --------------------------------------
        def desync_step(state):
            (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
             ne, pend, *prof) = state
            if prof:
                prof = (prof[0], prof[1] + 1)
            j = vx_nh(i)

            def to_end(_):
                # no more anchors: run out the loop as literals
                delta = (dsz - msl) - i
                return (i + delta, pred + delta, lit_run + delta, reg_lo,
                        reg_hi, top_lit, lit_below, ne, pend, *prof)

            def at_candidate(_):
                # NOTE: unlike the synced branch, the desynced search has
                # no `if (a_pos)` sentinel — a best match AT reference
                # position 0 is a real match (parser.cpp:507-531 vs :604)
                a_len, a_pos = resolve_anchor_p(j)
                st2 = (i, pred, lit_run, reg_lo, reg_hi, top_lit,
                       lit_below, ne, pend, *prof)
                return apply_match(st2, j, a_pos, a_len)

            return jax.lax.cond(j >= dsz - msl, to_end, at_candidate, None)

        # ---------------- synced chained window ----------------------------
        # One (WROWS, WCOLS) band serves a CHAIN of events: the E matrix,
        # its capped diagonal-LCE S, and the anchor row are built once per
        # window; each chained event only rebuilds the cheap state-
        # dependent masks. Events whose post-state stays inside the window
        # margins (advance <= WROWS - D - msl_eff rows and the analogous
        # column-span bound) continue the chain; anchor jumps, desyncs,
        # no-event advances, and margin breaks exit to a fresh window.
        # Cells whose measured run reaches min(CAP, matrix edge) are
        # re-contested exactly with the uncapped winner as the incumbent,
        # extending the old lmax==CAP escalation to edge-truncated runs.
        def sync_window(state0):
            # window counter in the high bits of the n_ss profiling slot
            # (low 16 bits keep counting inner iterations): chain rate =
            # iterations / windows, read from the event-buffer tail
            if PROF_COUNTERS:
                state0 = (state0[:9] + (state0[9] + (1 << 16),)
                          + state0[10:])
            i0 = state0[0]
            b0 = jnp.maximum(state0[1] - state0[2], 0)

            qrow, rrow = pld2(i0, b0)
            qcol = to_col(qrow, cmat[:, 0:128])[:WROWS]  # (WROWS, 1)
            E = (qcol == rrow).astype(I32)               # (WROWS, WCOLS)
            if "ebuild" in PROF_DOUBLE:
                qrow2, rrow2 = pld2(i0 + z, b0 + z)
                E = jnp.minimum(E, (to_col(qrow2, cmat[:, 0:128])[:WROWS]
                                    == rrow2).astype(I32))

            rowi = jax.lax.broadcasted_iota(I32, (WROWS, WCOLS), 0)
            coli = jax.lax.broadcasted_iota(I32, (WROWS, WCOLS), 1)
            S = diag_lce(E, CAP, rowi, coli)
            if "diag" in PROF_DOUBLE:
                S = jnp.minimum(S, diag_lce(E + z, CAP, rowi, coli))
            # window-constant hoists: per-cell saturation threshold (CAP
            # or the matrix edge; geo cells always keep >= msl_eff of
            # runway — see the factory asserts), the seed/capped S tests,
            # the tie-pack column term, and the col-row diagonal index.
            Scap = jnp.minimum(jnp.minimum(WROWS - rowi, WCOLS - coli),
                               CAP)
            SgeM = S >= msl
            SU = SgeM & (S < Scap)       # uncapped seed cells
            SC = SgeM & (S >= Scap)      # capped cells (exact re-contest)
            S18 = S << 18                # combined-reduce length bits
            # capped cells dominate the combined reduce via bit 24: one
            # reduce yields the uncapped winner (rows w/o capped cells)
            # OR the capped flag (fields then unusable; the rare contest
            # path recomputes its own incumbent)
            Sbase = jnp.where(SC, 1 << 24, 0) + S18
            c511 = 511 - coli
            cmr = coli - rowi

            cvec = ld_cand(i0, 128)                      # lanes d (packed)
            anch_col = to_col((cvec > 0).astype(I32),
                              cmat[:, 0:128])[:WROWS]    # (WROWS, 1)
            di = jax.lax.broadcasted_iota(I32, (WROWS, 1), 0)
            di23 = di << 23
            anch_bit = jnp.where(anch_col > 0, 1 << 22, 0)

            def win_body(carry):
                st, a_min, _done = carry
                (i, pred, lit_run, reg_lo, reg_hi, top_lit, lit_below,
                 ne, pend, *prof) = st
                if prof:
                    prof = (prof[0] + 1, prof[1])
                st = (i, pred, lit_run, reg_lo, reg_hi, top_lit,
                      lit_below, ne, pend, *prof)
                d_base = i - i0
                D_eff = jnp.minimum(mqd - lit_run + 1, (dsz - msl) - i)
                c_lo = (pred - lit_run) - b0             # <= 0 at entry
                off = pred - d_base - b0
                live = (rowi >= d_base) & (rowi < d_base + D_eff)
                geo = live & (coli >= c_lo) & (cmr < off + mrd)
                dist = jnp.abs(cmr - off)
                tie = ((127 - dist) << 9) | c511

                def _row_reduce(base):
                    # ONE combined reduce delivers the per-row uncapped
                    # winner with the full tie-break (longest, then
                    # nearest to the prediction, then smallest position:
                    # bits 18-23 length, 9-15 (127-dist), 0-8 (511-col))
                    # or, dominating via bit 24, the capped-cells flag.
                    return jnp.max(
                        jnp.where(geo & SgeM, base + tie, -1),
                        axis=1, keepdims=True)

                R1 = _row_reduce(Sbase)
                if "tiepack" in PROF_DOUBLE:
                    R1 = jnp.minimum(R1, _row_reduce(Sbase + (z << 18)))
                cap_r = R1 >= (1 << 24)
                lmax_r = (R1 >> 18) & 63
                brel_r = 511 - (R1 & 511)
                sf_r = ~cap_r & (R1 >= (msl << 18))

                live1 = (di >= d_base) & (di < d_base + D_eff)
                hit = ((R1 >= (msl << 18)) | (anch_col > 0)) & live1
                # packed per-row attempt record: bits 23-29 row, 22
                # anchor-present, 21 seed-found, 15-20 seed length, 6-14
                # window column, 5 row-has-capped-cells
                packed_rows = jnp.where(
                    hit,
                    di23 + anch_bit
                    + jnp.where(sf_r, (1 << 21) + (lmax_r << 15)
                                + (brel_r << 6), 0)
                    + jnp.where(cap_r, 1 << 5, 0),
                    BIG)
                pk = jnp.min(jnp.where(di >= a_min, packed_rows, BIG))
                if "reduce" in PROF_DOUBLE:
                    pk = jnp.minimum(
                        pk, jnp.min(jnp.where(di >= a_min,
                                              packed_rows + z, BIG)))

                def no_event(_):
                    adv = D_eff
                    new_lr = lit_run + adv
                    desync = new_lr > mqd
                    st2 = (i + adv, jnp.where(desync, -dsz, pred + adv),
                           new_lr, reg_lo, reg_hi, top_lit, lit_below,
                           ne, pend, *prof)
                    return (st2, jnp.int32(0), jnp.bool_(True))

                def attempt(_):
                    dd = pk >> 23                        # absolute row
                    has_anch = ((pk >> 22) & 1) > 0
                    sf_u = ((pk >> 21) & 1) > 0
                    lmax_u = (pk >> 15) & 63
                    brel_u = (pk >> 6) & 511
                    has_cap = ((pk >> 5) & 1) > 0
                    i_ev = i0 + dd
                    pred_dd = pred + (dd - d_base)
                    s_pos0 = b0 + brel_u

                    def contest(args, zz=0):
                        # exact re-contest of the row's capped cells in
                        # ascending column order, seeded with the row's
                        # uncapped winner as the incumbent (full
                        # tie-break incl. the smallest-position rule).
                        # The incumbent is recomputed here — pk's seed
                        # fields are unset for capped rows (bit-24
                        # dominance in the combined reduce).
                        rmask = (rowi == dd) & geo
                        RU = jnp.max(jnp.where(rmask & SU, S18 + tie, -1))
                        sfu2 = RU >= (msl << 18)
                        bl0 = jnp.where(sfu2, (RU >> 18) & 63, 0)
                        bp0 = jnp.where(sfu2, b0 + (511 - (RU & 511)), 0)
                        blen0 = bl0
                        bpos0 = bp0
                        bdst0 = jnp.where(sfu2, jnp.abs(bp0 - pred_dd),
                                          BIG)
                        capped_col = jnp.where(
                            rmask & SgeM & (S + zz >= Scap), coli, BIG)

                        def nxt(c0):
                            return jnp.min(
                                jnp.where(capped_col >= c0, capped_col,
                                          BIG))

                        def body(cst):
                            c, blen, bpos, bdst = cst
                            p = b0 + c
                            ml = exact_lce(
                                pld, i_ev, p,
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
                            (c0, blen0, bpos0, bdst0))
                        return blen, bpos

                    s_len, s_pos = jax.lax.cond(
                        has_cap, contest, lambda a: a,
                        (jnp.where(sf_u, lmax_u, 0),
                         jnp.where(sf_u, s_pos0, 0)))
                    if "seedfix" in PROF_DOUBLE:
                        s2 = jax.lax.cond(
                            has_cap, lambda a: contest(a, zz=z),
                            lambda a: a, (s_len, s_pos))
                        s_len = jnp.minimum(s_len, s2[0])
                        s_pos = jnp.minimum(s_pos, s2[1])
                    s_found = sf_u | has_cap

                    a_len, a_pos = jax.lax.cond(
                        has_anch,
                        lambda _: resolve_anchor_p(i_ev),
                        lambda _: (jnp.int32(0), jnp.int32(0)), None)

                    # arbitration (WIN table) when both present.
                    # NB a branchless variant (clamped index, always
                    # probe) measured SLOWER (+12% with the uncond
                    # log_event store): the probe's VREG->SREG extract
                    # per event outprices the two rare cond boundaries.
                    def arb(_):
                        alc = jnp.minimum(a_len, SAT) - mal
                        slc = jnp.minimum(s_len, SAT) - msl
                        lr_ev = lit_run + (dd - d_base)
                        widx = (alc * NS + slc) * NL + lr_ev
                        # WIN table is bit-packed (32 entries/word)
                        word = vext(win, widx >> 5)
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
                        st2 = apply_match(st, i_ev, bp, bl)
                        d2 = st2[0] - i0
                        sp2 = st2[1] - b0
                        chain = ((d2 + D + msl_eff <= WROWS)
                                 & (sp2 >= 0)
                                 & (sp2 + W + D + msl_eff <= WCOLS)
                                 & (st2[0] + msl < dsz)
                                 & (st2[7] < MAXEV - 1))
                        return (st2, d2, ~chain)

                    def spurious(_):
                        return (st, dd + 1, jnp.bool_(False))

                    return jax.lax.cond(good, apply, spurious, None)

                return jax.lax.cond(pk == BIG, no_event, attempt, None)

            out, _, _ = jax.lax.while_loop(
                lambda c: ~c[2], win_body,
                (state0, jnp.int32(0), jnp.bool_(False)))
            return out

        # ---------------- main loop ----------------------------------------
        def step(state):
            return jax.lax.cond(state[1] >= 0, sync_window, desync_step,
                                state)

        init = (jnp.int32(0), -dsz, jnp.int32(0), jnp.int32(-1),
                jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.zeros((1, 128), I32)) + (
                    (jnp.int32(0), jnp.int32(0)) if PROF_COUNTERS else ())
        final = jax.lax.while_loop(
            lambda st: (st[0] + msl < dsz) & (st[7] < MAXEV - 1), step,
            init)
        ne, pend = final[7], final[8]

        # flush the partial event block
        def flushp(_):
            ev_store(ne // 16, pend)

        jax.lax.cond(ne % 16 != 0, flushp, lambda _: None, None)
        # overflow (event buffer full before the parse finished) -> -1;
        # the host falls back to the native engine for that pair
        nev_out[0, 0] = jnp.where(final[0] + msl < dsz, -1, ne)
        if PROF_COUNTERS:
            # profiling counters in the (otherwise unused) last tail
            # block: lane 0 = synced supersteps, lane 1 = desync steps
            io = lane_iota(128)
            prof = jnp.where(io == 0, final[9],
                             jnp.where(io == 1, final[10], 0))
            ev_store(EvL // 128 - 1, prof)

    return kernel


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def _pad128(n):
    return -(-n // 128) * 128


def _bucket(n, lo=4096):
    """Power-of-two shape bucket (keeps the Mosaic compile count small)."""
    b = lo
    while b < n:
        b *= 2
    return b


def _code_salt() -> str:
    """Hash of the kernel-defining sources: AOT executables must never
    outlive the code that produced them."""
    import hashlib
    import os as _os

    h = hashlib.sha1()
    base = _os.path.dirname(_os.path.abspath(__file__))
    for name in ("pallas_engine.py", "pallas_v5.py", "pallas_v7.py",
                 "anchor_tables.py", "parse.py", "prep.py"):
        try:
            with open(_os.path.join(base, name), "rb") as fh:
                h.update(fh.read())
        except OSError:
            pass
    return h.hexdigest()[:16]


_AOT_MEMO: dict = {}
_AOT_SALT = None


def _aot_dir():
    import os as _os

    loc = _os.environ.get("LZANI_TPU_AOT", "")
    if loc == "0":
        return None
    if not loc:
        loc = _os.path.join(_os.path.expanduser("~"), ".cache",
                            "lzani_tpu", "aot")
    try:
        _os.makedirs(loc, exist_ok=True)
        return loc
    except OSError:
        return None


def _run_step_aot(step, key_parts, args):
    """Run the dispatch step through a persistent ahead-of-time compiled
    executable cache.

    The reference binary has zero warm-up; here Mosaic kernel compiles
    cost minutes per shape bucket and (on the axon dev tunnel) BYPASS
    jax's persistent compilation cache. ``jax.experimental.
    serialize_executable`` captures the fully compiled executable, so a
    later process deserializes in milliseconds instead of recompiling.
    Cache key = kernel-source hash + jax version + backend + the step's
    configuration + concrete arg shapes. Any failure falls back to the
    plain jit path (the cache is an optimization, never a failure)."""
    import os as _os
    import pickle

    global _AOT_SALT
    if _AOT_SALT is None:
        _AOT_SALT = _code_salt()
    shapes = tuple(
        (tuple(getattr(a, "shape", np.shape(a))),
         str(getattr(a, "dtype", np.asarray(a).dtype))) for a in args)
    key = (_AOT_SALT, jax.__version__, jax.default_backend(),
           key_parts, shapes,
           tuple(sorted(PROF_DOUBLE)), PROF_COUNTERS)
    hit = _AOT_MEMO.get(key)
    if hit is not None:
        return hit(*args)
    cache = _aot_dir()
    if cache is None:
        return step(*args)
    import hashlib

    fname = hashlib.sha1(repr(key).encode()).hexdigest()[:24] + ".aot"
    path = _os.path.join(cache, fname)
    dbg = _os.environ.get("LZANI_TPU_AOT_DEBUG")

    def _log(msg):
        if dbg:
            import sys as _sys
            print(f"lz-ani-tpu aot: {msg} [{fname}]", file=_sys.stderr)

    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load, serialize)
        import jax.tree_util as jtu

        if _os.path.exists(path):
            with open(path, "rb") as fh:
                payload = fh.read()
            in_tree = jtu.tree_structure((tuple(args), {}))
            out_tree = jtu.tree_structure((1, 2, 3))  # (ev, nev, overflow)
            compiled = deserialize_and_load(payload, in_tree, out_tree)
            _log("hit")
        else:
            _log("miss -> compiling")
            compiled = step.lower(*args).compile()
            payload, _, _ = serialize(compiled)
            tmp = path + f".tmp{_os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(payload)
            _os.replace(tmp, path)
        _AOT_MEMO[key] = compiled
        return compiled(*args)
    except Exception as e:
        _log(f"fallback to jit ({type(e).__name__}: {str(e)[:120]})")
        _AOT_MEMO[key] = step
        return step(*args)


_CMAT_CACHE: dict = {}


def _get_cmat_dev(aw: int, ar: int, device):
    """The (128, 512) constant matrix block is identical for every
    reference — upload it once per device, not once per ref (256 KB per
    upload through the tunnel otherwise dominates per-ref setup)."""
    key = (aw, ar, id(device))
    hit = _CMAT_CACHE.get(key)
    if hit is None:
        cm = build_const_mat(aw, ar)
        with jax.enable_x64(False):
            hit = jax.device_put(cm, device)
        _CMAT_CACHE[key] = hit
    return hit


class PallasRefIndex:
    """Per-reference state for the event-log kernel.

    The composite buffer, anchor position list, and WIN table are uploaded
    to the device once per reference (the tunnel/host link, not the kernel,
    dominates per-pair cost otherwise); queries run through a grid-batched
    pallas_call so a whole batch costs one dispatch.
    """

    #: event capacity per query (events beyond fall back to native).
    #: 2176 = the driver's EV_CAP download limit (2048) + one spare block
    #: + the profiling tail block — a larger buffer only cost VMEM and
    #: per-dispatch zero/copy traffic (events past EV_CAP fall back to
    #: the native engine regardless).
    MAXEV = 2176

    def __init__(self, codes: np.ndarray, params, interpret: bool = False,
                 device=None, host_join: bool = True):
        self.cfg = ParseCfg.from_params(params)
        cfg = self.cfg
        mrd = cfg.mrd
        self.interpret = interpret
        rb = ref_buffer_np(codes, mrd)
        self.nr = len(rb)
        self.LrP = _bucket(self.nr + 1024)
        buf = np.full((1, self.LrP), SYM_N_REF, np.int32)
        buf[0, :self.nr] = rb
        if host_join:  # v1 path; v2 rebuilds the join on device
            start, count, pos_s = build_anchor_join(rb, cfg.mal)
            self.join_start = start
            self.join_count = count
            self.KaP = _bucket(len(pos_s) + 256, lo=1024)
            pl_arr = np.zeros((1, self.KaP), np.int32)
            pl_arr[0, :len(pos_s)] = pos_s
        else:
            self.KaP = _bucket(self.nr + 256, lo=1024)
            pl_arr = None
        win = build_win_table(self.nr, cfg.mal, cfg.msl, cfg.mrd, cfg.mqd)
        wf = pack_bits_i32(win.reshape(-1), 128)  # bit-packed (1, W) i32
        self.WinP = wf.shape[1]
        cm = build_const_mat(cfg.aw, cfg.ar)
        # three-in-byte transfer form of the composite buffer (C5 codec —
        # io/packing.py layout): the v2 driver ships THIS per reference
        # and expands on device; the int32 form feeds the v1/kernel path.
        rbp = pack3_rows(buf.astype(np.uint8))
        self.LrP3 = _pad128(rbp.shape[1])
        rbp_padded = np.zeros((1, self.LrP3), np.uint8)
        rbp_padded[:, :rbp.shape[1]] = rbp
        self.device = device
        if interpret:
            self.refbuf, self.poslist, self.win_flat = buf, pl_arr, wf
            self.cmat = cm
            self.refbuf_p = rbp_padded
        else:  # device-resident, uploaded once
            with jax.enable_x64(False):
                if host_join:  # v1 path keeps the int32 buffer resident
                    self.refbuf = jax.device_put(buf, device)
                else:
                    self.refbuf = None
                self.refbuf_p = jax.device_put(rbp_padded, device)
                self.poslist = (jax.device_put(pl_arr, device)
                                if pl_arr is not None else None)
                self.win_flat = jax.device_put(wf, device)
                self.cmat = _get_cmat_dev(cfg.aw, cfg.ar, device)

    def _prep_query_np(self, q_codes: np.ndarray, LqP: int):
        cfg = self.cfg
        qb = query_buffer_np(q_codes, cfg.mrd)
        dsz = len(qb)
        qbuf = np.full(LqP, SYM_N_SEQ, np.int32)
        qbuf[:dsz] = qb
        qkm = kmer_stream_np(qb, cfg.mal)
        valid = qkm >= 0
        keys = np.where(valid, qkm, 0)
        cnt = np.where(valid, self.join_count[keys], 0).astype(np.int32)
        lo = np.where(cnt > 0, self.join_start[keys], 0).astype(np.int32)
        if cnt.max(initial=0) > 112:
            return None  # pathological anchor bucket; native fallback
        limit = dsz - cfg.msl
        hit = (cnt > 0) & (np.arange(dsz) < limit)
        # next anchor-candidate position >= i (suffix scan, vectorized)
        idxs = np.where(hit, np.arange(dsz), dsz)
        nh = np.minimum.accumulate(idxs[::-1])[::-1].astype(np.int32)
        cand = np.zeros(LqP, np.int32)
        next_hit = np.full(LqP, dsz, np.int32)
        cand[:dsz] = (lo << 7) | cnt       # packed (start, count)
        next_hit[:dsz] = nh
        return qbuf, cand, next_hit, dsz

    def parse_events_batch(self, queries: list) -> list:
        """Run the kernel over a query batch (one dispatch). Returns a list
        of int32 (n, 8) event logs; None entries = native fallback needed.
        """
        cfg = self.cfg
        B = len(queries)
        max_dsz = max(len(q) + cfg.mrd for q in queries)
        LqP = _bucket(max_dsz + 1024)
        EvL = self.MAXEV * 8
        qb = np.zeros((B, LqP), np.int32)
        cd = np.zeros((B, LqP), np.int32)
        nh = np.zeros((B, LqP), np.int32)
        scal = np.zeros((B, 128), np.int32)
        skip = [False] * B
        for b, q in enumerate(queries):
            prep = self._prep_query_np(q, LqP)
            if prep is None:
                skip[b] = True
                qb[b] = SYM_N_SEQ
                scal[b, 0] = cfg.msl  # dsz small -> kernel no-ops
                scal[b, 1] = self.nr
                continue
            qb[b], cd[b], nh[b], dsz = prep
            scal[b, 0] = dsz
            scal[b, 1] = self.nr

        run = _get_batch_runner(cfg, self.LrP, LqP, self.KaP, self.WinP,
                                EvL, B, self.interpret)
        with jax.enable_x64(False):
            perq = (scal[:, None, :], qb[:, None, :], cd[:, None, :],
                    nh[:, None, :])
            if self.device is not None:
                perq = tuple(jax.device_put(a, self.device) for a in perq)
            scal3, qb3, cd3, nh3 = perq
            ev, nev = run(scal3, self.refbuf, qb3, self.poslist, cd3,
                          nh3, self.win_flat, self.cmat)
            nev_h = np.asarray(nev)[:, 0, 0]
            ev_h = np.asarray(ev)[:, 0, :]  # (B, EvL)
        out = []
        cap = self.MAXEV - 16  # last block holds profiling counters
        for b in range(B):
            n = int(nev_h[b])
            if skip[b] or n < 0 or n > cap:
                out.append(None)
            else:
                out.append(ev_h[b, :n * 8].reshape(n, 8))
        return out

    def parse_events(self, q_codes: np.ndarray) -> np.ndarray:
        """Single-query entry (validation); raises on fallback cases."""
        ev = self.parse_events_batch([q_codes])[0]
        assert ev is not None, "kernel fallback (bucket overflow / MAXEV)"
        return ev


@lru_cache(maxsize=64)
def _get_batch_runner(cfg: ParseCfg, LrP: int, LqP: int, KaP: int,
                      WinP: int, EvL: int, B: int, interpret: bool):
    kern = make_parse_kernel(cfg, LrP, LqP, KaP, WinP, EvL)

    shared = lambda b: (0, 0)
    perq = lambda b: (b, 0, 0)

    cm2 = build_const_mat2(cfg.aw, cfg.ar)

    @jax.jit
    def run(scal, refbuf, qbuf, poslist, cand, next_hit, win, cmat):
        # per-query arrays are (B, 1, X); the squeezed (None) batch dim
        # keeps in-kernel refs 2D (1, X), matching the load helpers
        return pl.pallas_call(
            kern,
            grid=(B,),
            out_shape=(jax.ShapeDtypeStruct((B, 1, EvL), jnp.int32),
                       jax.ShapeDtypeStruct((B, 1, 1), jnp.int32)),
            in_specs=[
                pl.BlockSpec((None, 1, 128), perq, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, LrP), shared, memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, LqP), perq,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, KaP), shared, memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, LqP), perq,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, LqP), perq,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, WinP), shared, memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 512), shared, memory_space=pltpu.VMEM),
                pl.BlockSpec((CEF, 2 * CEF), shared,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((None, 1, EvL), perq,
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((None, 1, 1), perq,
                                    memory_space=pltpu.SMEM)),
            interpret=interpret,
        )(scal, refbuf, qbuf, poslist, cand, next_hit, win, cmat,
          jnp.asarray(cm2))

    return run


# ---------------------------------------------------------------------------
# production driver: all-vs-all on the device kernel + host replay
# ---------------------------------------------------------------------------


def _finalize_many(finalize, r, items):
    """Replay a batch of (q, ev, slot) pairs for one reference row on a
    single pool task (see the drain comment: per-pair futures were pure
    submission overhead)."""
    for q, ev, slot in items:
        finalize(r, q, ev, slot)


def all2all_pallas(codes, params, filter_csr=None, progress=None,
                   replay_threads: int = 0,
                   region_path: str | None = None, devices=None,
                   interpret: bool = False,
                   ilv: int | None = None, sim: bool | None = None):
    """All-vs-all triples via the device kernel; layout matches
    native_engine.all2all. The kernel produces event logs; the native
    replay reconstructs exact stats (and cross-checks extensions).

    Host work (query prep, C++ replay) overlaps with device batches via a
    small thread pool — the reference's host threads become the *feeder*
    of the accelerator rather than the compute engine.

    progress: optional callable(pairs_done, total_pairs) invoked as work
    units finish (the device-backend analog of lz_matcher.cpp:187-264).
    """
    import os
    import sys
    import threading
    from concurrent.futures import ThreadPoolExecutor

    verbosity = getattr(params, "verbosity_level", 1)

    def _warn(msg):
        if verbosity >= 1:
            print(msg, file=sys.stderr)

    from ..core import native_engine

    reason = device_envelope_reason(params)
    if reason is not None:
        _warn(f"lz-ani-tpu: parameters outside the device kernel "
              f"envelope ({reason}); this run uses the native engine "
              f"(byte-identical output)")
        n = len(codes)
        total = (n * (n - 1) if filter_csr is None
                 else len(filter_csr[1]))
        prog = mon = stop = None
        if progress is not None:
            prog = np.zeros(2, dtype=np.int64)
            stop = threading.Event()

            def _pump():
                while not stop.is_set():
                    progress(int(prog[1]), total, int(prog[0]), n)
                    stop.wait(0.2)

            mon = threading.Thread(target=_pump, daemon=True)
            mon.start()
        try:
            return native_engine.all2all(codes, params,
                                         filter_csr=filter_csr,
                                         region_path=region_path,
                                         progress=prog)
        finally:
            if mon is not None:
                stop.set()
                mon.join()
                progress(total, total, n, n)

    nthreads = replay_threads or max(2, (os.cpu_count() or 2) - 1)
    rf = open(region_path, "wb") if region_path else None
    rf_lock = threading.Lock()
    n = len(codes)
    if filter_csr is None:
        out = np.zeros((n, max(n - 1, 0), 3), dtype=np.int32)
    else:
        indptr, ids = filter_csr
        out = np.zeros((len(ids), 3), dtype=np.int32)

    finalize = _make_finalize(codes, params, out, rf, rf_lock)

    if devices is None:
        # local_devices: in a multi-host launch each process drives its
        # own chips (jax.devices() would span non-addressable ones)
        devices = jax.local_devices()[:1]
    eng = PallasAll2All(codes, params, devices=devices,
                        interpret=interpret, ilv=ilv, sim=sim)
    # enumerate work units (ref, range) and their wanted query slots
    # composite buffer too large for the kernel's VMEM budget -> the whole
    # reference row runs on the native engine (correctness never at risk)
    MAX_REF_SYMS = eng.MAX_REF_SYMS

    # references grouped G-per-dispatch (run-wide shape buckets, so every
    # group shares ONE executable) — amortizes the tunnel's un-hideable
    # per-dispatch round trip and the per-dispatch query prep across G
    # references. The final group is padded with cheap dummy refs (r=-1)
    # rather than compiling a remainder-G executable: loading a program
    # onto the device costs ~1 min through the tunnel.
    use_group = True
    GROUP = max(1, int(os.environ.get("LZANI_TPU_GROUP", "4")))
    mrd = params.max_dist_in_ref

    # long-genome routing: refs above the VMEM budget (or every device
    # row when the query bucket itself exceeds the VMEM envelope) run on
    # the HBM-resident big kernel; only rows beyond ITS budget fall back
    # to the native engine (reference parser.cpp:16-34 is unbounded)
    use_big = os.environ.get("LZANI_TPU_BIG", "1") != "0"
    # every device row routes big when the query bucket exceeds the VMEM
    # envelope OR the anchor length makes the dense 4^mal table
    # infeasible (the big path joins by sorted two-word keys instead)
    all_big = use_big and (eng.LqP > eng.MAX_Q_VMEM
                           or params.min_anchor_len > 13)

    rows_ok = []
    big_rows = []
    native_rows = []
    for r in range(n):
        if filter_csr is None:
            wanted = {q: None for q in range(n) if q != r}
        else:
            wanted = {int(q): int(indptr[r]) + k
                      for k, q in enumerate(ids[indptr[r]:indptr[r + 1]])}
        nr = 2 * len(codes[r]) + 3 * mrd
        if nr > MAX_REF_SYMS or all_big or params.min_anchor_len > 13:
            if use_big and nr <= eng.MAX_BIG_SYMS:
                big_rows.append((r, wanted))
            else:
                _warn(f"lz-ani-tpu: reference {r} "
                      f"({len(codes[r])} bp) exceeds the device budget "
                      f"({eng.MAX_BIG_SYMS if use_big else MAX_REF_SYMS}"
                      f" composite symbols); row runs on the native "
                      f"engine")
                native_rows.append((r, wanted))
            continue
        rows_ok.append((r, wanted))

    groups = []  # ([r...], [wanted...]) — padded to GROUP with r=-1
    for i0 in range(0, len(rows_ok), GROUP):
        chunk = rows_ok[i0:i0 + GROUP]
        r_list = [r for r, _ in chunk]
        wanteds = [w for _, w in chunk]
        while len(r_list) < GROUP:
            r_list.append(-1)
            wanteds.append({})
        groups.append((r_list, wanteds))

    units = []  # (r_list, lo, subs, gi) with subs[g] = {q: slot}
    group_rem = [0] * len(groups)   # un-drained units per group
    group_nreal = [sum(1 for r in g[0] if r >= 0) for g in groups]
    for gi, (r_list, wanteds) in enumerate(groups):
        if filter_csr is None:
            for lo in range(0, eng.n_pad, eng.B):
                subs = [{q: w for q, w in wanted.items()
                         if lo <= q < lo + eng.B} for wanted in wanteds]
                if any(subs):
                    units.append((r_list, lo, subs, gi))
                    group_rem[gi] += 1
        else:
            # sparse filter: dispatch the UNION of the group's wanted
            # queries densely (gather path) — a clustered filter's
            # partners scatter across the longest-first order, and
            # contiguous windows would parse ~B/(wanted per window)
            # times more pairs than the filter kept
            uq = sorted(set().union(*[set(w) for w in wanteds]))
            for c0 in range(0, len(uq), eng.B):
                chunk = uq[c0:c0 + eng.B]
                idx = np.full(eng.B, chunk[-1], np.int32)
                idx[:len(chunk)] = chunk
                posof = {q: i for i, q in enumerate(chunk)}
                subs = [{q: w for q, w in wanted.items() if q in posof}
                        for wanted in wanteds]
                units.append((r_list, (idx, posof), subs, gi))
                group_rem[gi] += 1

    big_units = []  # (r, lo, sub) — per-ref big-kernel dispatches
    big_rem = {}
    for r, wanted in big_rows:
        for lo in range(0, eng.n_pad, eng.B_big):
            sub = {q: w for q, w in wanted.items()
                   if lo <= q < lo + eng.B_big}
            if sub:
                big_units.append((r, lo, sub))
                big_rem[r] = big_rem.get(r, 0) + 1

    total_pairs = (sum(len(s) for u in units for s in u[2])
                   + sum(len(s) for _, _, s in big_units)
                   + sum(len(w) for _, w in native_rows))
    # the Sequences% counter (reference parity: a reference row counts
    # when its last pair completes, lz_matcher.cpp:257-264); rows with
    # zero wanted queries are complete before the run starts
    seqs_done = (sum(group_nreal[gi] for gi in range(len(groups))
                     if group_rem[gi] == 0)
                 + sum(1 for r, _ in big_rows if r not in big_rem))
    total_seqs = n
    n_fallback = 0

    dl_pool = ThreadPoolExecutor(max_workers=2)  # event-log downloads
    with ThreadPoolExecutor(max_workers=nthreads) as pool:
        pending = []
        inflight = []  # depth-2 dispatch pipeline hides downloads
        done_pairs = 0
        done_lock = threading.Lock()
        drain_futs = []

        def drain(u, handles):
            # runs on dl_pool: the collect() downloads (2 tunnel round
            # trips + the event bytes) overlap the next units' device
            # compute instead of serializing the dispatch loop
            nonlocal done_pairs, n_fallback, seqs_done
            r_list, lo, subs, gi = u
            posof = None
            if isinstance(lo, tuple):
                posof = lo[1]
            evs = (eng.collect_group(handles) if use_group
                   else [eng.collect(handles)])
            n_sub = 0
            for g, r in enumerate(r_list):
                # ONE replay task per reference row (not per pair):
                # 3,660 per-pair futures cost real Python/GIL churn on
                # a 4-vCPU host; per-row batches keep the pool balanced
                # (<= B pairs each) at 1/B the submission overhead
                items = []
                for q, w in subs[g].items():
                    slot = ((r, q - 1 if q > r else q)
                            if filter_csr is None else w)
                    b = posof[q] if posof is not None else q - lo
                    if evs[g][b] is None:
                        with done_lock:
                            n_fallback += 1
                        if verbosity >= 2:
                            print(f"lz-ani-tpu: pair ({r},{q}) fell back "
                                  f"to the native engine (event/anchor "
                                  f"capacity)", file=sys.stderr)
                    items.append((q, evs[g][b], slot))
                if items:
                    pending.append(pool.submit(_finalize_many, finalize,
                                               r, items))
                n_sub += len(subs[g])
            with done_lock:
                done_pairs += n_sub
                dp = done_pairs
                group_rem[gi] -= 1
                if group_rem[gi] == 0:
                    seqs_done += group_nreal[gi]
                sd = seqs_done
            if progress is not None:
                progress(dp, total_pairs, sd, total_seqs)

        # depth-2 pipeline per device: every chip keeps one unit in flight
        # while the previous one drains (P1 fan-out, lz_matcher.cpp:184-270).
        # Reference indexes (win-table math + uploads) are prefetched on
        # the worker pool so index construction overlaps device compute;
        # consecutive units against the same reference share one index.
        depth = 4 * len(eng.devices)
        PREFETCH = depth + 1
        idx_cache: dict = {}
        cache_lock = threading.Lock()

        def get_index(r_list, dev):
            key = (tuple(r_list), id(dev))
            with cache_lock:
                hit = idx_cache.get(key)
            if hit is None:
                hit = (eng.build_group_index(r_list, dev) if use_group
                       else eng.build_index(r_list[0], dev))
                with cache_lock:
                    idx_cache[key] = hit
            return hit

        idx_futs: dict = {}

        def get_unit_inputs(j):
            dev = eng.device_for(j)
            idx = get_index(units[j][0], dev)
            qr = None
            if isinstance(units[j][1], tuple):
                # sparse-filter gather: issue the qgather jit from the
                # pool so its RPC hides inside the current kernel's
                # device wait instead of serializing the dispatcher
                # thread (the tunnel blocks any RPC issued while an
                # execution is in flight — profile_e2e_pallas.py)
                qr = eng.gather_qrows(units[j][1][0], dev)
            return idx, qr

        def ensure_prefetch(k0):
            for j in range(k0, min(k0 + PREFETCH, len(units))):
                if j not in idx_futs:
                    idx_futs[j] = pool.submit(get_unit_inputs, j)

        for k, u in enumerate(units):
            ensure_prefetch(k)
            idx, qr = idx_futs.pop(k).result()
            if use_group:
                u1 = u[1][0] if isinstance(u[1], tuple) else u[1]
                handles = eng.dispatch_group(idx, u1,
                                             eng.device_for(k),
                                             qrows=qr)
            else:
                handles = eng.dispatch_range(u[0][0], u[1],
                                             eng.device_for(k), idx=idx)
            # drop stale cache entries (units are ordered by ref)
            with cache_lock:
                lo_r = min(r for r in u[0] if r >= 0)
                for key in [ky for ky in idx_cache if max(ky[0]) < lo_r]:
                    del idx_cache[key]
            inflight.append((u, handles))
            if len(inflight) >= depth:
                drain_futs.append(dl_pool.submit(drain,
                                                 *inflight.pop(0)))
        while inflight:
            drain_futs.append(dl_pool.submit(drain, *inflight.pop(0)))

        # ---- long-genome rows: per-ref big-kernel dispatches ------------
        def drain_big(u, handles):
            nonlocal done_pairs, n_fallback, seqs_done
            r, lo, sub = u
            evs = eng.collect_big(handles)
            for q, w in sub.items():
                slot = ((r, q - 1 if q > r else q)
                        if filter_csr is None else w)
                if evs[q - lo] is None:
                    with done_lock:
                        n_fallback += 1
                    if verbosity >= 2:
                        print(f"lz-ani-tpu: pair ({r},{q}) fell back to "
                              f"the native engine (event capacity)",
                              file=sys.stderr)
                pending.append(pool.submit(finalize, r, q, evs[q - lo],
                                           slot))
            with done_lock:
                done_pairs += len(sub)
                dp = done_pairs
                big_rem[r] -= 1
                if big_rem[r] == 0:
                    seqs_done += 1
                sd = seqs_done
            if progress is not None:
                progress(dp, total_pairs, sd, total_seqs)

        bidx_cache: dict = {}
        big_inflight = []
        for k, u in enumerate(big_units):
            r, lo, sub = u
            dev = eng.device_for(k)
            bkey = (r, id(dev))
            bidx = bidx_cache.get(bkey)
            if bidx is None:
                # one live index per device (megabase join builds are
                # hundreds of MB device-side)
                for ky in [ky for ky in bidx_cache if ky[1] == id(dev)]:
                    del bidx_cache[ky]
                bidx = eng.build_big_index(r, dev)
                bidx_cache[bkey] = bidx
            handles = eng.dispatch_big(bidx, lo, dev)
            big_inflight.append((u, handles))
            if len(big_inflight) >= 2 * len(eng.devices):
                drain_futs.append(dl_pool.submit(drain_big,
                                                 *big_inflight.pop(0)))
        while big_inflight:
            drain_futs.append(dl_pool.submit(drain_big,
                                             *big_inflight.pop(0)))
        for f in drain_futs:
            f.result()
        for r, wanted in native_rows:
            for q, w in wanted.items():
                slot = ((r, q - 1 if q > r else q)
                        if filter_csr is None else w)
                pending.append(pool.submit(finalize, r, q, None, slot))
            done_pairs += len(wanted)
            seqs_done += 1
            if progress is not None:
                progress(done_pairs, total_pairs, seqs_done, total_seqs)
        for f in pending:
            f.result()
    dl_pool.shutdown(wait=True)
    if n_fallback:
        _warn(f"lz-ani-tpu: {n_fallback}/{total_pairs} pairs fell back to "
              f"the native engine (event-buffer or anchor-bucket capacity)")
    if rf is not None:
        rf.close()
    return out




# ---------------------------------------------------------------------------
# on-device query preparation (v2 production path)
#
# The tunnel/host link is the bottleneck of the v1 flow (~512 KB of per-pair
# candidate arrays). v2 keeps everything on device: the anchor join is
# rebuilt from the resident reference buffer (kmer stream + stable sort +
# scatter counts), and the per-query candidate/next-hit arrays are gathered
# on device. Each query is uploaded exactly once per run.
# ---------------------------------------------------------------------------

def dev_kmer_stream(buf, k, n_sym=4):
    """int32 k-mers per position of (B, L) int32 codes; -1 where the window
    has a non-ACGT code or runs off the end (parser.cpp:53-103)."""
    B, L = buf.shape
    val = jnp.zeros((B, L), jnp.int32)
    ok = jnp.ones((B, L), jnp.bool_)
    for j in range(k):
        sh = jnp.roll(buf, -j, axis=1)
        val = (val << 2) | jnp.where(sh < n_sym, sh, 0)
        ok &= sh < n_sym
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    ok &= idx <= L - k
    return jnp.where(ok, val, -1)


def dev_kmer_stream2(buf, k, n_sym=4):
    """Two-word k-mer stream for k > 15 (the dense 4^k table and single
    int32 keys both stop working): (hi, lo, ok) with hi = the first
    ceil(k/2) symbols, lo = the rest (each <= 30 bits), ok = the window
    is all-ACGT and in-bounds. (hi, lo) equality <=> substring equality,
    so the sorted join below reproduces the reference ht_long semantics
    (parser.cpp:146-188) exactly, with zero hash collisions."""
    B, L = buf.shape
    assert k <= 30, k
    a = k - k // 2
    hi = jnp.zeros((B, L), jnp.int32)
    lo = jnp.zeros((B, L), jnp.int32)
    ok = jnp.ones((B, L), jnp.bool_)
    for j in range(k):
        sh = jnp.roll(buf, -j, axis=1)
        c = jnp.where(sh < n_sym, sh, 0)
        if j < a:
            hi = (hi << 2) | c
        else:
            lo = (lo << 2) | c
        ok &= sh < n_sym
    idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    ok &= idx <= L - k
    return hi, lo, ok


def _lower_bound2(khi, klo, qhi, qlo, right: bool):
    """Branchless binary search over the (khi, klo)-sorted arrays (length
    a power of two): number of entries lexicographically < (qhi, qlo)
    (right=False) or <= (right=True). Vectorized over any query shape;
    log2(n) gather rounds."""
    n = khi.shape[0]
    assert n & (n - 1) == 0, n
    pos = jnp.zeros(qhi.shape, jnp.int32)
    step = n
    while step > 1:
        step //= 2
        c = pos + step
        h = jnp.take(khi, c - 1)
        l2 = jnp.take(klo, c - 1)
        if right:
            go = (h < qhi) | ((h == qhi) & (l2 <= qlo))
        else:
            go = (h < qhi) | ((h == qhi) & (l2 < qlo))
        pos = jnp.where(go, c, pos)
    return pos


@lru_cache(maxsize=8)
def _get_big_ref_build(LrP: int, KaP: int, mal: int):
    """Per-reference join build for the long-genome path: unpack + two-
    word kmer stream + (hi, lo, pos) sort. Returns the device-resident
    unpacked reference, the sorted key arrays (the query-side binary
    search probes them) and the sorted position list."""

    @jax.jit
    def build(refbuf_p):
        refbuf = dev_unpack3(refbuf_p, LrP)              # (1, LrP)
        hi, lo, ok = dev_kmer_stream2(refbuf, mal)
        khi = jnp.where(ok[0], hi[0], BIG)               # invalid last
        klo = jnp.where(ok[0], lo[0], 0)
        pos = jax.lax.broadcasted_iota(jnp.int32, (LrP, 1), 0)[:, 0]
        khi_s, klo_s, pos_s = jax.lax.sort((khi, klo, pos), num_keys=2)
        if KaP <= LrP:
            poslist = pos_s[:KaP].reshape(1, KaP)
        else:
            poslist = (jnp.zeros((1, KaP), jnp.int32)
                       .at[0, :LrP].set(pos_s))
        return refbuf, khi_s, klo_s, poslist

    return build


@lru_cache(maxsize=8)
def _get_big_step(cfg: ParseCfg, LrP: int, LqP: int, KaP: int, WinP: int,
                  EvL: int, B: int, interpret: bool):
    """Long-genome dispatch: query prep (two-word kmer stream + sorted-
    join binary search -> two-plane candidate table) + the big pallas
    kernel (HBM-resident buffers, grid (B,)). No candidate-count cap and
    no count overflow gate — counts are unbounded, as in the reference's
    ht_long probe chains (parser.cpp:518-531)."""
    kern = make_parse_kernel(cfg, LrP, LqP, KaP, WinP, EvL, big=True)
    mal, msl = cfg.mal, cfg.msl
    perq = lambda b: (b, 0, 0)
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)

    @jax.jit
    def step(refbuf, khi_s, klo_s, poslist, Qpacked, lo_row, nr_s,
             dszs_full, win, cmat, skip_row):
        dsz = jax.lax.dynamic_slice(dszs_full, (lo_row,), (B,))
        # self-pair (q == ref) and padding rows no-op in the kernel:
        # a megabase self-parse would otherwise dominate the dispatch
        rowid = lo_row + jnp.arange(B, dtype=jnp.int32)
        dsz = jnp.where(rowid == skip_row, jnp.int32(msl), dsz)
        scal = (jnp.zeros((B, 128), jnp.int32)
                .at[:, 0].set(dsz)
                .at[:, 1].set(nr_s))
        qsel_p = jax.lax.dynamic_slice(
            Qpacked, (lo_row, 0), (B, Qpacked.shape[1]))
        qsel = dev_unpack3(qsel_p, LqP)
        qhi, qlo, qok = dev_kmer_stream2(qsel, mal)
        s_l = _lower_bound2(khi_s, klo_s, qhi, qlo, right=False)
        s_r = _lower_bound2(khi_s, klo_s, qhi, qlo, right=True)
        cnt = jnp.where(qok, s_r - s_l, 0)
        idx = jax.lax.broadcasted_iota(jnp.int32, (B, LqP), 1)
        limit = (dsz - msl)[:, None]
        hit = (cnt > 0) & (idx < limit)
        nh_src = jnp.where(hit, idx, dsz[:, None])
        nh = jnp.flip(jax.lax.cummin(jnp.flip(nh_src, 1), axis=1), 1)
        mask = idx < dsz[:, None]
        # two-plane candidate table: rows 2b (start) / 2b+1 (count)
        cd = jnp.stack([jnp.where(mask, s_l, 0),
                        jnp.where(mask, cnt, 0)],
                       axis=1).reshape(2 * B, LqP)
        nhm = jnp.where(mask, nh, dsz[:, None])
        ev, nev = pl.pallas_call(
            kern,
            grid=(B,),
            scratch_shapes=[
                pltpu.VMEM((1, CEF + 128), jnp.int32),   # q-side DMA
                pltpu.VMEM((1, CEF + 128), jnp.int32),   # r-side DMA
                pltpu.VMEM((1, 256), jnp.int32),         # tables DMA
                pltpu.VMEM((1, 128), jnp.int32),         # ev staging
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            out_shape=(jax.ShapeDtypeStruct((B, 1, EvL), jnp.int32),
                       jax.ShapeDtypeStruct((B, 1, 1), jnp.int32)),
            in_specs=[
                pl.BlockSpec((None, 1, 128), perq,
                             memory_space=pltpu.SMEM),
                anyspec,             # refbuf   (1, LrP)   HBM
                anyspec,             # qbuf     (B, LqP)   HBM
                anyspec,             # poslist  (1, KaP)   HBM
                anyspec,             # cand     (2B, LqP)  HBM
                anyspec,             # next_hit (B, LqP)   HBM
                pl.BlockSpec((1, WinP), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 512), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CEF, 2 * CEF), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(anyspec,
                       pl.BlockSpec((None, 1, 1), perq,
                                    memory_space=pltpu.SMEM)),
            interpret=interpret,
        )(scal[:, None, :], refbuf, qsel[:, None, :], poslist,
          cd[:, None, :], nhm[:, None, :], win, cmat,
          jnp.asarray(build_const_mat2(cfg.aw, cfg.ar)))
        ev = ev[:, 0, :]
        nev_flat = nev[:, 0, 0]
        if LqP <= (1 << 16):
            evr = ev.reshape(B, EvL // 8, 8)
            p0 = evr[..., 0] | (evr[..., 2] << 16)
            p2 = evr[..., 3] | (evr[..., 4] << 16)
            ev = jnp.stack([p0, evr[..., 1], p2],
                           axis=-1).reshape(B, (EvL // 8) * 3)
        overflow = jnp.zeros((B,), jnp.bool_)
        return ev, nev_flat, overflow

    return step


class PallasGroupIndex:
    """Per-reference device state for a GROUP of references that share the
    same shape buckets, stacked along a leading axis so one dispatch can
    run G references x B queries on a (G, B) pallas grid.

    Motivation (measured, round 2): the axon tunnel serializes dispatches,
    so every per-reference dispatch pays ~25-40 ms of un-hideable
    round-trip + download latency — ~20% of the warm vir61 wall. Grouping
    G references per dispatch amortizes that fixed cost G-fold and shares
    the per-dispatch query prep (unpack + kmer stream) across the group.
    """

    def __init__(self, codes_list, params, interpret: bool = False,
                 device=None, LrP: int | None = None,
                 KaP: int | None = None):
        self.cfg = cfg = ParseCfg.from_params(params)
        mrd = cfg.mrd
        self.interpret = interpret
        self.device = device
        G = self.G = len(codes_list)
        rbs = [ref_buffer_np(c, mrd) for c in codes_list]
        self.nrs = np.array([len(rb) for rb in rbs], np.int32)
        # shape buckets are forced run-wide by the driver so that ONE
        # executable serves every dispatch: loading a compiled program
        # onto the device costs ~1 min through the tunnel, paid once per
        # distinct executable per process
        mx = int(self.nrs.max())
        self.LrP = LrP if LrP is not None else _bucket(mx + 1024)
        self.KaP = KaP if KaP is not None else _bucket(mx + 256, lo=1024)
        assert self.LrP >= mx + 1024 and self.KaP >= mx + 256
        bufs = np.full((G, self.LrP), SYM_N_REF, np.uint8)
        for g, rb in enumerate(rbs):
            bufs[g, :len(rb)] = rb
        wfs = np.concatenate(
            [pack_bits_i32(
                build_win_table(int(n), cfg.mal, cfg.msl, cfg.mrd,
                                cfg.mqd).reshape(-1), 128)
             for n in self.nrs], axis=0)          # (G, WinP)
        self.WinP = wfs.shape[1]
        rbp = pack3_rows(bufs)
        LrP3 = _pad128(rbp.shape[1])
        rbp_padded = np.zeros((G, LrP3), np.uint8)
        rbp_padded[:, :rbp.shape[1]] = rbp
        if interpret:
            self.refbuf_p, self.win, self.nrs_dev = rbp_padded, wfs, \
                self.nrs
            self.cmat = build_const_mat(cfg.aw, cfg.ar)
        else:
            with jax.enable_x64(False):
                self.refbuf_p = jax.device_put(rbp_padded, device)
                self.win = jax.device_put(wfs, device)
                self.nrs_dev = jax.device_put(self.nrs, device)
                self.cmat = _get_cmat_dev(cfg.aw, cfg.ar, device)


@lru_cache(maxsize=32)
def _get_qslice(npad: int, wq: int, B: int):
    """Tiny jit that slices the resident query matrix (and dszs) down to
    one dispatch's (B, wq) window. Kept OUTSIDE the Mosaic step so the
    expensive group executable is independent of the run's n_pad: one
    program per shape bucket serves ANY set size (and a small-set
    prewarm genuinely primes the big run — BENCH r4's greedy key failed
    precisely because the old full-Q argument specialized the program
    on n_pad)."""

    @jax.jit
    def f(Qpacked, dszs_full, lo):
        return (jax.lax.dynamic_slice(Qpacked, (lo, 0), (B, wq)),
                jax.lax.dynamic_slice(dszs_full, (lo,), (B,)))

    return f


@lru_cache(maxsize=32)
def _get_qgather(npad: int, wq: int, B: int):
    """Gather twin of _get_qslice: picks B ARBITRARY query rows (and
    their dszs) for one dispatch. Same (B, wq) output shape, so the
    expensive group executable is shared with the contiguous path. This
    is what makes sparse kmer-db filters efficient on device: a
    clustered filter's wanted queries scatter across the longest-first
    order, and contiguous 64-query windows made the kernel parse ~100x
    more pairs than the filter kept (measured: the 10k Vclust-shape
    demo crawled at ~100 pairs/s wanted-rate while the kernel ran flat
    out)."""

    @jax.jit
    def f(Qpacked, dszs_full, idx):
        return (jnp.take(Qpacked, idx, axis=0),
                jnp.take(dszs_full, idx, axis=0))

    return f


@lru_cache(maxsize=32)
def _get_group_step(cfg: ParseCfg, LrP: int, LqP: int, KaP: int, WinP: int,
                    B: int, G: int, cnt_cap: int, ev_cap: int,
                    interpret: bool, LqPrep: int | None = None,
                    ilv: int = 1, sim: bool = False, wr: int = 0,
                    cef: int = 0, wc: int = 0, au: int = 1, mu: int = 1):
    """Fused jit for a reference GROUP: G independent join builds + one
    shared query prep + a (G, B) pallas grid — one dispatch per group.
    ilv > 1 selects the v5 latency-interleaved kernel: ilv queries per
    kernel program on a (G, B//ilv) grid (ops/pallas_v5.py); sim swaps
    in the v7 predicated-SIMT-tail kernel (ops/pallas_v7.py, same block
    contract) at the same interleave width — the production default."""
    EvL = PallasRefIndex.MAXEV * 8
    if sim:
        from .pallas_v7 import make_parse_kernel_sim
        assert B % ilv == 0, (B, ilv)
        kern = make_parse_kernel_sim(cfg, LrP, LqP, KaP, WinP, EvL, ilv,
                                     WR=wr or None, CEF_=cef or None,
                                     WC=wc or None, AU=au, MU=mu)
    elif ilv > 1:
        from .pallas_v5 import make_parse_kernel_ilv
        assert B % ilv == 0, (B, ilv)
        kern = make_parse_kernel_ilv(cfg, LrP, LqP, KaP, WinP, EvL, ilv)
    else:
        kern = make_parse_kernel(cfg, LrP, LqP, KaP, WinP, EvL)
    mal, msl = cfg.mal, cfg.msl
    nk = 1 << (2 * mal)

    sharedg = lambda g, b: (g, 0, 0)
    perqb = lambda g, b: (b, 0, 0)
    pergb = lambda g, b: (g, b, 0, 0)
    fixed2 = lambda g, b: (0, 0)

    @jax.jit
    def step(refbuf_p, q_rows, dsz, nrs, win, cmat):
        # q_rows/dsz arrive pre-sliced to this dispatch's B rows
        # (_get_qslice) so this executable is n-independent
        # --- per-ref join builds (batched over the group) -----------------
        refbuf = dev_unpack3(refbuf_p, LrP)              # (G, LrP)
        km = dev_kmer_stream(refbuf, mal)                # (G, LrP)
        pos = jax.lax.broadcasted_iota(jnp.int32, (G, LrP), 1)
        keys = jnp.where(km >= 0, km, nk)
        _, pos_s = jax.lax.sort((keys, pos), num_keys=1)  # per-row sort
        goff = jnp.arange(G, dtype=jnp.int32) * (nk + 1)
        count = (jnp.zeros(G * (nk + 1), jnp.int32)
                 .at[(keys + goff[:, None]).reshape(-1)].add(1)
                 .reshape(G, nk + 1)[:, :nk])
        start = jnp.concatenate(
            [jnp.zeros((G, 1), jnp.int32),
             jnp.cumsum(count, axis=1)[:, :-1]], axis=1)
        ptab = jnp.where(count > 0,
                         (start << 7) | jnp.minimum(count, 127), 0)
        if KaP <= LrP:
            poslist = pos_s[:, :KaP]
        else:
            poslist = (jnp.zeros((G, KaP), jnp.int32)
                       .at[:, :LrP].set(pos_s))
        # --- query prep: ONCE for the whole group -------------------------
        Lp = LqPrep or LqP
        Lp3 = min(-(-Lp // 3) + 128, q_rows.shape[1])
        qsel = dev_unpack3(q_rows[:, :Lp3], Lp)          # (B, Lp)
        qkm = dev_kmer_stream(qsel, mal)
        qk = jnp.where(qkm >= 0, qkm, 0)
        # per-ref candidate tables: one flat gather over the stacked ptab
        flat = ptab.reshape(-1)
        gk = qk[None, :, :] + (jnp.arange(G, dtype=jnp.int32) * nk
                               )[:, None, None]
        pk = jnp.where(qkm[None] >= 0, flat[gk], 0)      # (G, B, Lp)
        cnt = pk & 127
        overflow = jnp.max(cnt, axis=2) > cnt_cap        # (G, B)
        idxm = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1)
        limit = (dsz - msl)[:, None]
        hit = (cnt > 0) & (idxm < limit)[None]
        nh_src = jnp.where(hit, idxm[None], dsz[None, :, None])
        nh = jnp.flip(jax.lax.cummin(jnp.flip(nh_src, 2), axis=2), 2)
        mask = (idxm < dsz[:, None])[None]
        cd = jnp.where(mask, pk, 0)
        nhm = jnp.where(mask, nh, dsz[None, :, None])
        if Lp < LqP:
            pad = LqP - Lp
            qsel = jnp.concatenate(
                [qsel, jnp.full((B, pad), SYM_N_SEQ, jnp.int32)], axis=1)
            cd = jnp.concatenate(
                [cd, jnp.zeros((G, B, pad), jnp.int32)], axis=2)
            nhm = jnp.concatenate(
                [nhm, jnp.zeros((G, B, pad), jnp.int32)], axis=2)
        scal = (jnp.zeros((G, B, 128), jnp.int32)
                .at[:, :, 0].set(dsz[None, :])
                .at[:, :, 1].set(nrs[:, None]))
        # --- kernel: (G, B) grid, query index innermost -------------------
        if ilv > 1 or sim:
            # ilv gets its OWN (fully-covered) dimension: Mosaic requires
            # sublane block dims divisible by 8 or equal to the array dim
            CE2 = (cef or CEF) if sim else CEF
            Bi = B // ilv
            if sim:
                # v7 holds qbuf/refbuf int8-resident (codes 0..5): 1/4
                # the VMEM of the i32 layout — the enabler for ilv=16
                # (see make_parse_kernel_sim)
                qsel = qsel.astype(jnp.int8)
                refbuf = refbuf.astype(jnp.int8)
                if LqP <= (1 << 16):
                    # next_hit values are positions <= dsz < LqP-1024,
                    # so the biased (v - 32768) layout fits i16 exactly
                    # — the other 2 MB that ilv=16 needed (the i8+i16
                    # layout left the 16 MB budget 80 KB short at i32
                    # next_hit; compile log in DESIGN.md round 5)
                    nhm = (nhm - 32768).astype(jnp.int16)
            pergb4 = lambda g, b: (g, b, 0, 0)
            perq3 = lambda g, b: (b, 0, 0)
            sharedg3 = lambda g, b: (g, 0, 0)
            ev, nev = pl.pallas_call(
                kern,
                grid=(G, Bi),
                out_shape=(
                    jax.ShapeDtypeStruct((G, Bi, ilv, EvL), jnp.int32),
                    jax.ShapeDtypeStruct((G, Bi, ilv, 1), jnp.int32)),
                in_specs=[
                    pl.BlockSpec((None, None, ilv, 128), pergb4,
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((None, 1, LrP), sharedg3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((None, ilv, LqP), perq3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((None, 1, KaP), sharedg3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((None, None, ilv, LqP), pergb4,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((None, None, ilv, LqP), pergb4,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((None, 1, WinP), sharedg3,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, 512), fixed2,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((CE2, 2 * CE2), fixed2,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((None, None, ilv, EvL), pergb4,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((None, None, ilv, 1), pergb4,
                                 memory_space=pltpu.SMEM)),
                interpret=interpret,
            )(scal.reshape(G, Bi, ilv, 128), refbuf[:, None, :],
              qsel.reshape(Bi, ilv, LqP), poslist[:, None, :],
              cd.reshape(G, Bi, ilv, LqP), nhm.reshape(G, Bi, ilv, LqP),
              win[:, None, :], cmat,
              jnp.asarray(build_const_mat2(cfg.aw, cfg.ar, CE2)))
            ev2 = ev.reshape(G, B, EvL)
            nev_flat = nev.reshape(G, B)
            if LqP <= (1 << 16):
                evr = ev2.reshape(G, B, EvL // 8, 8)
                p0 = evr[..., 0] | (evr[..., 2] << 16)
                p2 = evr[..., 3] | (evr[..., 4] << 16)
                ev2 = jnp.stack([p0, evr[..., 1], p2],
                                axis=-1).reshape(G, B, (EvL // 8) * 3)
            return ev2, nev_flat, overflow
        ev, nev = pl.pallas_call(
            kern,
            grid=(G, B),
            out_shape=(jax.ShapeDtypeStruct((G, B, 1, EvL), jnp.int32),
                       jax.ShapeDtypeStruct((G, B, 1, 1), jnp.int32)),
            in_specs=[
                pl.BlockSpec((None, None, 1, 128), pergb,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, 1, LrP), sharedg,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, LqP), perqb,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, KaP), sharedg,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, 1, LqP), pergb,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, 1, LqP), pergb,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, WinP), sharedg,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 512), fixed2, memory_space=pltpu.VMEM),
                pl.BlockSpec((CEF, 2 * CEF), fixed2,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((None, None, 1, EvL), pergb,
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((None, None, 1, 1), pergb,
                                    memory_space=pltpu.SMEM)),
            interpret=interpret,
        )(scal[:, :, None, :], refbuf[:, None, :], qsel[:, None, :],
          poslist[:, None, :], cd[:, :, None, :], nhm[:, :, None, :],
          win[:, None, :], cmat,
          jnp.asarray(build_const_mat2(cfg.aw, cfg.ar)))
        ev2 = ev[:, :, 0, :]
        nev_flat = nev[:, :, 0, 0]
        if LqP <= (1 << 16):
            evr = ev2.reshape(G, B, EvL // 8, 8)
            p0 = evr[..., 0] | (evr[..., 2] << 16)
            p2 = evr[..., 3] | (evr[..., 4] << 16)
            ev2 = jnp.stack([p0, evr[..., 1], p2],
                            axis=-1).reshape(G, B, (EvL // 8) * 3)
        return ev2, nev_flat, overflow

    return step


@lru_cache(maxsize=32)
def _get_ref_step(cfg: ParseCfg, LrP: int, LqP: int, KaP: int, WinP: int,
                  B: int, cnt_cap: int, ev_cap: int, interpret: bool,
                  LqPrep: int | None = None):
    """One fused jit per (shape bucket): device join build + query prep +
    the pallas kernel + download-size reduction — a single dispatch per
    reference batch (the v3 single-query program; the group path above
    carries the production v7/v5 kernels)."""
    EvL = PallasRefIndex.MAXEV * 8
    kern = make_parse_kernel(cfg, LrP, LqP, KaP, WinP, EvL)
    mal, msl = cfg.mal, cfg.msl
    nk = 1 << (2 * mal)

    shared = lambda b: (0, 0)
    perq = lambda b: (b, 0, 0)

    @jax.jit
    def step(refbuf_p, Qpacked, lo_row, nr_s, dszs_full, win, cmat):
        # per-dispatch scalars/tables derived on device: the query-length
        # table is resident (uploaded once per run), so a dispatch ships
        # only (lo, nr) — per-dispatch host->device traffic is O(1)
        dsz = jax.lax.dynamic_slice(dszs_full, (lo_row,), (B,))
        scal = (jnp.zeros((B, 128), jnp.int32)
                .at[:, 0].set(dsz)
                .at[:, 1].set(nr_s))
        # --- expand the three-in-byte transfer forms (C5 codec) -----------
        refbuf = dev_unpack3(refbuf_p, LrP)
        # --- join build (per reference) -----------------------------------
        km = dev_kmer_stream(refbuf, mal)[0]
        pos = jax.lax.broadcasted_iota(jnp.int32, (LrP, 1), 0)[:, 0]
        keys = jnp.where(km >= 0, km, nk)
        _, pos_s = jax.lax.sort((keys, pos), num_keys=1)
        count = jnp.zeros(nk + 1, jnp.int32).at[keys].add(1)
        count = count[:nk]
        start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(count)[:-1]])
        # packed (start << 7 | count) table: ONE gather per query feeds the
        # kernel's anchor probes (count clamped at 127; the overflow gate
        # below fires first at cnt_cap < 127)
        ptab = jnp.where(count > 0,
                         (start << 7) | jnp.minimum(count, 127), 0)
        poslist = pos_s[:KaP].reshape(1, KaP) if KaP <= LrP else (
            jnp.zeros((1, KaP), jnp.int32).at[0, :LrP].set(pos_s))
        # --- query prep ---------------------------------------------------
        # the resident query matrix is 3-codes-per-byte; expand the B-row
        # slice and rebuild its kmer stream per dispatch (transient int32).
        # Prep runs at LqPrep <= LqP (the tightest 1/2- or 3/4-bucket that
        # holds every query): the 4M-entry ptab gather + cummin are the
        # dominant per-dispatch cost and scale with this width; results
        # are padded back to the kernel's LqP with inert values.
        Lp = LqPrep or LqP
        Lp3 = min(-(-Lp // 3) + 128, Qpacked.shape[1])
        qsel_p = jax.lax.dynamic_slice(
            Qpacked, (lo_row, 0), (B, Qpacked.shape[1]))
        qsel = dev_unpack3(qsel_p[:, :Lp3], Lp)
        qkm = dev_kmer_stream(qsel, mal)
        qk = jnp.where(qkm >= 0, qkm, 0)
        pk = jnp.where(qkm >= 0, ptab[qk], 0)
        cnt = pk & 127
        overflow = jnp.max(cnt, axis=1) > cnt_cap
        idx = jax.lax.broadcasted_iota(jnp.int32, (B, Lp), 1)
        limit = (dsz - msl)[:, None]
        hit = (cnt > 0) & (idx < limit)
        nh_src = jnp.where(hit, idx, dsz[:, None])
        nh = jnp.flip(jax.lax.cummin(jnp.flip(nh_src, 1), axis=1), 1)
        mask = idx < dsz[:, None]
        cd = jnp.where(mask, pk, 0)
        nhm = jnp.where(mask, nh, dsz[:, None])
        if Lp < LqP:
            pad = LqP - Lp
            qsel = jnp.concatenate(
                [qsel, jnp.full((B, pad), SYM_N_SEQ, jnp.int32)], axis=1)
            cd = jnp.concatenate([cd, jnp.zeros((B, pad), jnp.int32)],
                                 axis=1)
            nhm = jnp.concatenate([nhm, jnp.zeros((B, pad), jnp.int32)],
                                  axis=1)
        # --- kernel -------------------------------------------------------
        ev, nev = pl.pallas_call(
            kern,
            grid=(B,),
            out_shape=(jax.ShapeDtypeStruct((B, 1, EvL), jnp.int32),
                       jax.ShapeDtypeStruct((B, 1, 1), jnp.int32)),
            in_specs=[
                pl.BlockSpec((None, 1, 128), perq,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, LrP), shared, memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, LqP), perq,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, KaP), shared, memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, LqP), perq,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, LqP), perq,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, WinP), shared, memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 512), shared,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CEF, 2 * CEF), shared,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(pl.BlockSpec((None, 1, EvL), perq,
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((None, 1, 1), perq,
                                    memory_space=pltpu.SMEM)),
            interpret=interpret,
        )(scal[:, None, :], refbuf, qsel[:, None, :], poslist,
          cd[:, None, :], nhm[:, None, :], win, cmat,
          jnp.asarray(build_const_mat2(cfg.aw, cfg.ar)))
        ev2 = ev[:, 0, :]
        nev_flat = nev[:, 0, 0]
        if LqP <= (1 << 16):
            # all of {i_ev, blen, bwd, ext} < dsz < 2^16: pack each record
            # into 3 int32 on device — the tunnel/host link moves 2.7x
            # fewer bytes per batch (bpos needs the full 32 bits)
            evr = ev2.reshape(B, EvL // 8, 8)
            p0 = evr[..., 0] | (evr[..., 2] << 16)
            p2 = evr[..., 3] | (evr[..., 4] << 16)
            ev2 = jnp.stack([p0, evr[..., 1], p2],
                            axis=-1).reshape(B, (EvL // 8) * 3)
        return ev2, nev_flat, overflow

    return step


class PallasAll2All:
    """v2 all-vs-all driver: single query upload per device, on-device
    prep, one kernel dispatch per (reference, query-range) unit. Units are
    independent (the P1 row-parallelism of lz_matcher.cpp:184-270), so a
    multi-chip host round-robins them over `devices` — each device holds
    its own query-matrix replica and receives the per-ref index."""

    CNT_CAP = 112

    #: composite-symbol budget above which a reference row leaves the
    #: VMEM-resident kernels (-> the big path below, else native)
    MAX_REF_SYMS = 700_000

    #: composite-symbol budget of the HBM-resident big kernel (~16.7 Mb
    #: genomes — covers BASELINE.json configs[4]'s 2-10 Mb bacterial
    #: envelope with margin; composite = 2*len + 3*mrd, parser.cpp:16-34
    #: is unbounded). int32 position fields bound it well above this;
    #: the practical cost is the per-dispatch HBM prep arrays
    #: (3 sort planes x LrP_big x 4 B = ~400 MB at 2^25). Above it the
    #: row runs on the native engine. Round-3 value was 1 << 24 (~8.3 Mb),
    #: which silently excluded the top of the stated bacterial envelope.
    MAX_BIG_SYMS = 1 << 25

    #: the small kernels keep (ilv, LqP) int32 query blocks in VMEM;
    #: above this bucket every device row routes through the big kernel
    MAX_Q_VMEM = 1 << 19

    def __init__(self, codes, params, devices=None, interpret=False,
                 ilv: int | None = None, sim: bool | None = None):
        self.codes = codes
        self.params = params
        self.interpret = interpret
        self.cfg = ParseCfg.from_params(params)
        cfg = self.cfg
        n = len(codes)
        # v5 latency-interleave width for the GROUP path (queries per
        # kernel program; ops/pallas_v5.py). Env override for A/B runs;
        # 0/None = auto (resolved after LqP below: ilv=2 measured +5%
        # on interleaved full-vir61 process pairs, within the validated
        # VMEM envelope only).
        if ilv is None:
            import os as _os
            ilv = int(_os.environ.get("LZANI_TPU_ILV", "0"))
        if ilv and (ilv < 1 or (ilv & (ilv - 1))):
            # B is always a power-of-two bucket; anything else cannot
            # divide the grid — fail loudly, not with a bare assert
            raise ValueError(
                f"LZANI_TPU_ILV/ilv must be a power of two >= 1 "
                f"(got {ilv})")
        self.ilv = ilv
        # v7 predicated-SIMT-tail kernel toggle (ops/pallas_v7.py):
        # -1/None = auto (resolved after LqP below), 0 = off,
        # 1 = force v7 at the resolved interleave width.
        if sim is None:
            import os as _os
            sim = int(_os.environ.get("LZANI_TPU_SIM", "-1"))
        self.sim = int(sim)
        # v7 window-row geometry override (0 = compiled default WROWS).
        # Resolved HERE so the value reaches the kernel factory AND every
        # executable-cache key (lru + AOT): geometry variants must never
        # alias to the same cached executable.
        import os as _wos
        self.wr = int(_wos.environ.get("LZANI_TPU_WROWS", "0"))
        if not self.wr:
            # auto = the minimal legal row count (ceil8(D + msl_eff),
            # floored at the measured 48): the runway above it is pure
            # element work in the profiled-heaviest window cluster.
            # Round-4 vir61 A/B: 0.553 vs 0.597 s/group (DESIGN.md).
            msl_eff = min(cfg.msl, CAP)
            self.wr = max(48, -(-(cfg.mqd + 1 + msl_eff) // 8) * 8)
        # v7 forward-ext first-chunk width (LZANI_TPU_CEF to override;
        # auto = 256: ext > 256 is 0.81%/event on vir61, and the halved
        # (256,512) banded matmul measured 0.558 vs 0.597 s/group —
        # continuations stay CEF-free via the shared rare path)
        self.cef = int(_wos.environ.get("LZANI_TPU_CEF", "0")) or 256
        # SIMT-loop unroll factor (anchor resolve + ext continuations):
        # steps per while iteration. All per-step updates are masked by
        # the per-pair live flags, so a double-step is exactness-safe;
        # it halves the loop-carry/cond overhead at 2x body code. A/B
        # knob (LZANI_TPU_AU); threaded through every executable-cache
        # key like wr/cef/wc.
        self.au = int(_wos.environ.get("LZANI_TPU_AU", "0")) or 1
        # main macro-loop steps per while iteration (same masked-update
        # safety argument as au: a step where no pair acts is a no-op,
        # so double-stepping is exact; halves the big loop's carry/cond
        # overhead at 2x kernel body code). A/B knob (LZANI_TPU_MU).
        self.mu = int(_wos.environ.get("LZANI_TPU_MU", "0")) or 1
        # window-column geometry: auto = minimal legal (128 at default
        # params). Smaller win than the row shrink (-2.5% vir61 vs
        # -7.4%: lanes stream cheaper than sublanes, and col-edge cap
        # escalations claw some back) but it won every regime in the
        # round-4 A/B (dissim +2.1%, near-identical +7.8%) — DESIGN.md.
        self.wc = int(_wos.environ.get("LZANI_TPU_WCOLS", "0"))
        if not self.wc:
            msl_eff = min(cfg.msl, CAP)
            self.wc = max(128, -(-(cfg.mqd + cfg.mrd + cfg.mqd + 1
                                   + msl_eff) // 128) * 128)
        self.devices = list(devices) if devices else [None]
        # O(1) per-item lengths on the packed store (no unpack passes)
        slens = (np.asarray(codes.slens, np.int64)
                 if hasattr(codes, "slens")
                 else np.array([len(c) for c in codes], np.int64))
        self.dszs = (slens + cfg.mrd).astype(np.int32)
        # run-wide reference buckets over the device-eligible refs: every
        # group dispatch then shares one executable (see PallasGroupIndex)
        nr_all = (2 * slens + 3 * cfg.mrd).tolist()
        nr_ok = [v for v in nr_all if v <= self.MAX_REF_SYMS] or [4096]
        self.LrP_ref = _bucket(max(nr_ok) + 1024)
        self.KaP_ref = _bucket(max(nr_ok) + 256, lo=1024)
        self.LqP = _bucket(int(self.dszs.max()) + 1024)
        # tightest 1/2- or 3/4-bucket that holds every query + margin:
        # the per-dispatch prep (ptab gather, cummin) runs at this width
        need = int(self.dszs.max()) + 1024
        self.LqPrep = next(w for w in (self.LqP // 2, self.LqP * 3 // 4,
                                       self.LqP) if w >= need)
        self.packed_ev = self.LqP <= (1 << 16)
        # long-genome (HBM-resident) path buckets: refs above
        # MAX_REF_SYMS but within MAX_BIG_SYMS, plus — when the query
        # bucket itself exceeds the VMEM envelope — every device row
        nr_big = [v for v in nr_all
                  if self.MAX_REF_SYMS < v <= self.MAX_BIG_SYMS]
        if self.LqP > self.MAX_Q_VMEM or cfg.mal > 13:
            nr_big = [v for v in nr_all if v <= self.MAX_BIG_SYMS]
        self.LrP_big = _bucket(max(nr_big) + 1024) if nr_big else 0
        self.KaP_big = (_bucket(self.LrP_big + 256, lo=1024)
                        if nr_big else 0)
        # event capacity scales with the query bucket (bacterial pairs
        # log 10^5-10^6 events); EvL = MAXEV * 8 int32 lanes
        self.MAXEV_BIG = max(PallasRefIndex.MAXEV, self.LqP // 32)
        # queries per big dispatch: bounded so one kernel EXECUTION stays
        # well under the worker's hang watchdog (a 4-query 5 Mb dispatch
        # ~85 s crashed the worker; 1-query ~21 s is fine — measured
        # round 3). ~4 s/Mb/query similar-pair => cap ~2^23 query slots
        # per execution. Env override for A/B.
        import os as _os
        bb = int(_os.environ.get("LZANI_TPU_BBIG", "0"))
        self.B_big = bb if bb > 0 else max(1, min(4, (1 << 23) // self.LqP))
        if self.sim < 0:
            # auto: ON inside the TPU-validated VMEM envelope — the v7
            # predicated-SIMT-tail kernel beat the v6 incumbent on BOTH
            # canonical workloads, min-of-N interleaved-process timed
            # (round 4, ops/DESIGN.md): vir61 0.601-0.603 s/group vs
            # v6's 0.698-0.700 (+16%, two process pairs, oracle 8/8),
            # ab_dissimilar 737.9 pairs/s vs 699.9 (+5.4%), byte-exact
            # everywhere; larger buckets validated end-to-end by
            # scripts/test_v7_buckets.py.
            self.sim = 1 if self.LqP <= (1 << 18) else 0
        self.sim = bool(self.sim)
        if not self.ilv:
            if self.sim:
                # v7 interleave width. Round 4 took ilv=8 (vir61 0.489
                # vs 0.518 s/group over 4). Round 5's int8 qbuf/refbuf
                # + biased-i16 next_hit residency (1/4 resp. 1/2 the
                # VMEM) made ilv=16 FIT the 16 MB budget (i32 measured
                # 80 KB over in the compile log) and WIN both regimes:
                # vir61 540.4 vs 513.6 pairs/s e2e (+5.2%), dissim-150
                # 807.7 vs 782.3 (+3.2%), min-of-3 interleaved,
                # oracle-exact (DESIGN.md round 5). The i16 next_hit
                # only exists at LqP <= 2^16, which is also where the
                # VMEM math holds — auto takes 16 exactly there and 2
                # up to the validated envelope.
                self.ilv = 16 if self.LqP <= (1 << 16) else 2
            else:
                # v5/v3 path: ilv=2 measured >= v3 on every workload
                # regime (round 2), inside the validated envelope only.
                self.ilv = 2 if self.LqP <= (1 << 18) else 1
        self.B = min(64, _bucket(n, lo=8))      # contiguous batch rows
        if self.ilv > 1:
            self.B = max(self.B, self.ilv)      # grid needs B % ilv == 0
        n_pad = -(-n // self.B) * self.B
        qb = np.full((n_pad, self.LqP), SYM_N_SEQ, np.uint8)
        for i, c in enumerate(codes):
            qb[i, :self.dszs[i]] = query_buffer_np(c, cfg.mrd)
        self.n_pad = n_pad
        # device-resident query matrix at the reference's 3-codes-per-byte
        # density (seq_reservoir.h:30-186 parity via io/packing.py layout);
        # dispatches expand their B-row slice to int32 transiently
        qp = pack3_rows(qb)
        Lp = _pad128(qp.shape[1])
        qp_padded = np.zeros((n_pad, Lp), np.uint8)
        qp_padded[:, :qp.shape[1]] = qp
        dszs_pad = np.full(n_pad, cfg.msl, np.int32)
        dszs_pad[:n] = self.dszs
        with jax.enable_x64(False):
            self.Q = {d: jax.device_put(qp_padded, d)
                      for d in self.devices}
            # query-length table resident per device (dispatches derive
            # their scal block on device; see _get_ref_step.step)
            self.DSZ = {d: jax.device_put(dszs_pad, d)
                        for d in self.devices}
        # per-(device, lo) memo of sliced query windows: the slice is
        # group-independent, so one jit per lo serves the whole run (see
        # dispatch_group)
        self._qrows_cache: dict = {}

    EV_CAP = 2048  # downloaded events per query; beyond -> native fallback

    def device_for(self, k: int):
        """Device owning work unit k (round-robin)."""
        return self.devices[k % len(self.devices)]

    def build_index(self, r: int, device=None):
        """Build + upload reference r's device index (host win-table math
        plus two small uploads). Safe to call from a prefetch thread so
        index construction overlaps the previous reference's kernel."""
        if device is None:
            device = self.devices[0]
        return PallasRefIndex(self.codes[r], self.params,
                              interpret=self.interpret,
                              host_join=False, device=device)

    def dispatch_range(self, r: int, lo: int, device=None, idx=None):
        """Submit one fused dispatch (join + prep + kernel) for queries
        [lo, lo+B) against reference r on `device`; returns futures."""
        cfg = self.cfg
        if device is None:
            device = self.devices[0]
        if idx is None:
            idx = self.build_index(r, device)
        B = self.B
        key_parts = (cfg, idx.LrP, self.LqP, idx.KaP, idx.WinP, B,
                     self.CNT_CAP, self.EV_CAP, self.LqPrep)
        with jax.enable_x64(False):
            step = _get_ref_step(cfg, idx.LrP, self.LqP, idx.KaP, idx.WinP,
                                 B, self.CNT_CAP, self.EV_CAP,
                                 self.interpret, self.LqPrep)
            args = (idx.refbuf_p, self.Q[device], np.int32(lo),
                    np.int32(idx.nr), self.DSZ[device], idx.win_flat,
                    idx.cmat)
            if self.interpret or len(self.devices) > 1:
                # AOT executables pin to the default device; the
                # multi-chip round-robin keeps the plain jit path
                ev, nev, overflow = step(*args)
            else:
                ev, nev, overflow = _run_step_aot(step, key_parts, args)
        return ev, nev, overflow

    def _decode_ev(self, row: np.ndarray, n_ev: int, bad: bool,
                   cap: int | None = None):
        """One query's event rows from a downloaded buffer row (or None
        for the native-fallback cases)."""
        if bad or n_ev < 0 or n_ev > (cap if cap is not None
                                      else self.EV_CAP):
            return None
        if self.packed_ev:
            u = row[:n_ev * 3].view(np.uint32).reshape(n_ev, 3)
            rec = np.zeros((n_ev, 8), np.int32)
            rec[:, 0] = u[:, 0] & 0xFFFF
            rec[:, 2] = u[:, 0] >> 16
            rec[:, 1] = u[:, 1].view(np.int32)  # bpos: full 32 bits
            rec[:, 3] = u[:, 2] & 0xFFFF
            rec[:, 4] = u[:, 2] >> 16
            return rec
        return row[:n_ev * 8].reshape(n_ev, 8)

    def collect(self, handles):
        """Download results of a dispatch_range call -> event-log list."""
        ev, nev, overflow = handles
        stride = 3 if self.packed_ev else 8
        with jax.enable_x64(False):
            nev_h, ovf = jax.device_get((nev, overflow))
            mx = max(int(nev_h.max(initial=0)), 16) * stride
            ev_h = np.asarray(ev[:, :mx])
        return [self._decode_ev(ev_h[b], int(nev_h[b]), bool(ovf[b]))
                for b in range(self.B)]

    def build_group_index(self, r_list, device=None):
        """Stacked device index for a reference group. r == -1 entries are
        cheap dummy slots (padding the final group so every dispatch uses
        the ONE run-wide executable instead of compiling a remainder-G
        variant)."""
        if device is None:
            device = self.devices[0]
        dummy = np.zeros(16, np.uint8)
        return PallasGroupIndex(
            [self.codes[r] if r >= 0 else dummy for r in r_list],
            self.params, interpret=self.interpret, device=device,
            LrP=self.LrP_ref, KaP=self.KaP_ref)

    def gather_qrows(self, idx, device=None):
        """Sparse-filter query gather for one dispatch's arbitrary row
        set — callable from a prefetch pool so the RPC overlaps device
        compute (see all2all_pallas.get_unit_inputs)."""
        if device is None:
            device = self.devices[0]
        with jax.enable_x64(False):
            Qd = self.Q[device]
            qg = _get_qgather(int(Qd.shape[0]), int(Qd.shape[1]), self.B)
            return qg(Qd, self.DSZ[device], np.asarray(idx, np.int32))

    def dispatch_group(self, gidx: PallasGroupIndex, lo: int, device=None,
                       qrows=None):
        """One fused dispatch for G references x queries [lo, lo+B).
        qrows: optional pre-gathered (q_rows, dsz_b) from gather_qrows
        (sparse-filter prefetch path)."""
        cfg = self.cfg
        if device is None:
            device = self.devices[0]
        B = self.B
        key_parts = ("group", cfg, gidx.LrP, self.LqP, gidx.KaP,
                     gidx.WinP, B, gidx.G, self.CNT_CAP, self.EV_CAP,
                     self.LqPrep, self.ilv, self.sim, self.wr,
                     self.cef, self.wc, self.au, self.mu)
        with jax.enable_x64(False):
            step = _get_group_step(cfg, gidx.LrP, self.LqP, gidx.KaP,
                                   gidx.WinP, B, gidx.G, self.CNT_CAP,
                                   self.EV_CAP, self.interpret,
                                   self.LqPrep, self.ilv, self.sim,
                                   self.wr, self.cef, self.wc, self.au,
                                   self.mu)
            Qd = self.Q[device]
            if qrows is not None:
                q_rows, dsz_b = qrows
            elif isinstance(lo, (int, np.integer)):
                # q_rows depends only on (device, lo) — never the group —
                # so the slice is computed ONCE per run and reused by all
                # groups. Through the tunnel every RPC issued while an
                # execution is in flight blocks until the device frees
                # (measured scripts/profile_e2e_pallas.py: the per-
                # dispatch slice jit put ~25-50 ms of pure RTT on the
                # critical path, x n_units). When n_pad == B the slice
                # is the identity and the resident matrix is passed
                # straight through (zero RPCs).
                qkey = (id(device), int(lo))
                hit = self._qrows_cache.get(qkey)
                if hit is not None:
                    q_rows, dsz_b = hit
                elif self.n_pad == B and int(lo) == 0:
                    q_rows, dsz_b = Qd, self.DSZ[device]
                    self._qrows_cache[qkey] = (q_rows, dsz_b)
                else:
                    qsl = _get_qslice(int(Qd.shape[0]), int(Qd.shape[1]),
                                      B)
                    q_rows, dsz_b = qsl(Qd, self.DSZ[device],
                                        np.int32(lo))
                    self._qrows_cache[qkey] = (q_rows, dsz_b)
            else:
                # arbitrary row set (sparse-filter path): same program,
                # gathered inputs
                qg = _get_qgather(int(Qd.shape[0]), int(Qd.shape[1]), B)
                q_rows, dsz_b = qg(Qd, self.DSZ[device],
                                   np.asarray(lo, np.int32))
            args = (gidx.refbuf_p, q_rows, dsz_b,
                    gidx.nrs_dev, gidx.win, gidx.cmat)
            if self.interpret or len(self.devices) > 1:
                ev, nev, overflow = step(*args)
            else:
                ev, nev, overflow = _run_step_aot(step, key_parts, args)
        return ev, nev, overflow

    def collect_group(self, handles):
        """Download a dispatch_group result -> per-(ref, query) event-log
        lists: out[g][b]."""
        ev, nev, overflow = handles
        G = nev.shape[0]
        stride = 3 if self.packed_ev else 8
        with jax.enable_x64(False):
            nev_h, ovf = jax.device_get((nev, overflow))
            mx = max(int(nev_h.max(initial=0)), 16) * stride
            ev_h = np.asarray(ev[:, :, :mx])
        return [[self._decode_ev(ev_h[g, b], int(nev_h[g, b]),
                                 bool(ovf[g, b]))
                 for b in range(self.B)] for g in range(G)]

    # ---- long-genome (HBM-resident) path ---------------------------------

    def build_big_index(self, r: int, device=None):
        """Per-reference state for the big kernel: packed upload + win
        table (PallasGroupIndex, G=1 at the big buckets) + the sorted-
        join build (unpacked ref, sorted two-word keys, position list) —
        all device-resident; reference prepare_reference parity
        (parser.cpp:16-34, unbounded)."""
        if device is None:
            device = self.devices[0]
        gidx = PallasGroupIndex([self.codes[r]], self.params,
                                interpret=self.interpret, device=device,
                                LrP=self.LrP_big, KaP=self.KaP_big)
        build = _get_big_ref_build(self.LrP_big, self.KaP_big,
                                   self.cfg.mal)
        with jax.enable_x64(False):
            refbuf, khi_s, klo_s, poslist = build(gidx.refbuf_p)
        return dict(gidx=gidx, refbuf=refbuf, khi=khi_s, klo=klo_s,
                    pos=poslist, nr=int(gidx.nrs[0]), r=r)

    def dispatch_big(self, bidx, lo: int, device=None):
        cfg = self.cfg
        if device is None:
            device = self.devices[0]
        gidx = bidx["gidx"]
        EvL = self.MAXEV_BIG * 8
        key_parts = ("big", cfg, self.LrP_big, self.LqP, self.KaP_big,
                     gidx.WinP, EvL, self.B_big)
        with jax.enable_x64(False):
            step = _get_big_step(cfg, self.LrP_big, self.LqP,
                                 self.KaP_big, gidx.WinP, EvL,
                                 self.B_big, self.interpret)
            args = (bidx["refbuf"], bidx["khi"], bidx["klo"],
                    bidx["pos"], self.Q[device], np.int32(lo),
                    np.int32(bidx["nr"]), self.DSZ[device], gidx.win,
                    gidx.cmat, np.int32(bidx.get("r", -1)))
            if self.interpret or len(self.devices) > 1:
                ev, nev, overflow = step(*args)
            else:
                ev, nev, overflow = _run_step_aot(step, key_parts, args)
        return ev, nev, overflow

    def collect_big(self, handles):
        """Download a dispatch_big result -> per-query event logs (None =
        native fallback: event-capacity overflow)."""
        ev, nev, _ = handles
        stride = 3 if self.packed_ev else 8
        with jax.enable_x64(False):
            nev_h = np.asarray(jax.device_get(nev))
            mx = max(int(nev_h.max(initial=0)), 16) * stride
            ev_h = np.asarray(ev[:, :mx])
        cap = self.MAXEV_BIG - 16
        return [self._decode_ev(ev_h[b], int(nev_h[b]), False, cap=cap)
                for b in range(self.B_big)]

    def run_range(self, r: int, lo: int):
        return self.collect(self.dispatch_range(r, lo))

