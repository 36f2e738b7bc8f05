"""The greedy LZ-parse automaton as a JAX state machine.

One (reference, query) pair is a sequential dependency chain
(factor choice at position i depends on all earlier factors), so the device
engine parallelizes *across pairs*: this module defines ``parse_one`` for a
single pair and the engine vmaps it over query batches. All control flow is
lax.while_loop / lax.fori_loop with static shapes; the factor list lives in a
fixed int32[Fmax+1, 4] stack whose last row is a write-discard slot so that
conditional pushes are O(1) scatters instead of vmapped selects.

Semantics are branch-for-branch those of the reference parser
(/root/reference/src/parser.cpp:482-716; sub-passes cited inline), validated
bit-exactly against the native oracle in tests/test_jax_engine.py.
"""

from __future__ import annotations

from dataclasses import dataclass


import jax
import jax.numpy as jnp

F_LIT, F_CLOSE, F_DISTANT = 0, 1, 2

I32 = jnp.int32


@dataclass(frozen=True)
class ParseCfg:
    mal: int = 11
    msl: int = 7
    mrd: int = 40
    mqd: int = 40
    reg: int = 35
    aw: int = 15
    am: int = 7
    ar: int = 3

    @classmethod
    def from_params(cls, p) -> "ParseCfg":
        return cls(p.min_anchor_len, p.min_seed_len, p.max_dist_in_ref,
                   p.max_dist_in_query, p.min_region_len, p.approx_window,
                   p.approx_mismatches, p.approx_run_len)


def _mix64(x):
    x = x.astype(jnp.uint64)
    x ^= x >> 33
    x *= jnp.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> 33
    x *= jnp.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> 33
    return x


def _prob_len(length):
    """4^-len as an exact f64 (parser.h:134-172; table entries are exact
    powers of two, and 1-4^-len rounds to 1.0 for len >= 27 anyway)."""
    e = jnp.minimum(length.astype(jnp.float64), 600.0)
    return jnp.exp2(-2.0 * e)


def _fpow(base, e):
    """Binary exponentiation with the reference's multiplication order
    (parser.h:174-188). e is uint32."""

    def body(c):
        r, b, e = c
        r = jnp.where((e & 1) == 1, r * b, r)
        return r, b * b, e // 2

    r, _, _ = jax.lax.while_loop(lambda c: c[2] > 0, body,
                                 (jnp.float64(1.0), base, e))
    return r


def make_pair_parser(cfg: ParseCfg, Lr: int, Lq: int, table_size: int):
    """Returns parse_one(ref_ctx, query_ctx) -> (stats[3], fac, fp).

    ref_ctx = (refbuf u8[Lr], ref_true i32, tab i32[T], tmask u64,
               bucket_pos i32[Lr], bucket_lo i32[4^msl], bucket_cnt i32[4^msl])
    query_ctx = (qbuf u8[Lq], q_true i32, q_seeds i64[Lq], q_anchors i64[Lq])
    """
    mal, msl, mrd, mqd = cfg.mal, cfg.msl, cfg.mrd, cfg.mqd
    reg, aw, am, ar = cfg.reg, cfg.aw, cfg.am, cfg.ar
    Fmax = Lq + 4  # every factor covers >= 1 query position

    def parse_one(refbuf, ref_true, tab, tmask, bucket_pos, bucket_lo,
                  bucket_cnt, qbuf, q_true, q_seeds, q_anchors):
        ref_true = ref_true.astype(I32)
        q_true = q_true.astype(I32)

        def combine_synced(s_len, s_pos, a_len, a_pos, lit_run):
            """Anchor-vs-close-seed arbitration (parser.cpp:604-623); an
            anchor at reference position 0 is ignored, and a seed result at
            position 0 counts as absent."""

            def with_anchor(_):
                def arbitrate(_):
                    pa = _fpow(
                        1.0 - _prob_len(a_len),
                        (2 * (ref_true.astype(jnp.int64) + 1 - a_len))
                        .astype(jnp.uint32))
                    pc = _fpow(1.0 - _prob_len(s_len),
                               (lit_run + mrd + 1 - s_len).astype(jnp.uint32))
                    take_a = pa > pc
                    return (jnp.where(take_a, a_len, s_len),
                            jnp.where(take_a, a_pos, s_pos))

                return jax.lax.cond(s_pos == 0,
                                    lambda _: (a_len, a_pos), arbitrate, None)

            return jax.lax.cond(a_pos != 0, with_anchor,
                                lambda _: (s_len, s_pos), None)

        # -- primitives ----------------------------------------------------
        def equal_len(rpos, dpos, start):
            """parser.cpp:192-207"""
            cap = jnp.minimum(ref_true - rpos, q_true - dpos)

            def cond(r):
                return (r < cap) & (refbuf[rpos + r] == qbuf[dpos + r])

            return jax.lax.while_loop(cond, lambda r: r + 1, start)

        def anchor_search(i):
            """Walk the whole probe cluster; longest wins, first-seen wins
            ties (parser.cpp:514-531)."""
            km = q_anchors[i]

            def walk(c):
                h, blen, bpos = c
                entry = tab[h.astype(I32)]
                ml = equal_len(entry, i, I32(0))
                take = (ml >= mal) & (ml > blen)
                blen = jnp.where(take, ml, blen)
                bpos = jnp.where(take, entry, bpos)
                return (h + 1) & tmask, blen, bpos

            def run(_):
                h0 = _mix64(km) & tmask
                _, blen, bpos = jax.lax.while_loop(
                    lambda c: tab[c[0].astype(I32)] != -1, walk,
                    (h0, I32(0), I32(0)))
                return blen, bpos

            return jax.lax.cond(km >= 0, run,
                                lambda _: (I32(0), I32(0)), None)

        def seed_search(i, pred, lit_run):
            """Bucket scan within [pred-lit_run, pred+mrd): longest wins,
            nearest-to-prediction wins ties (parser.cpp:548-580)."""
            sd = q_seeds[i]

            def run(_):
                lo = bucket_lo[sd]
                n = bucket_cnt[sd]
                target = pred - lit_run

                def bs(c):
                    a, b = c
                    mid = (a + b) // 2
                    below = bucket_pos[lo + mid] < target
                    return jnp.where(below, mid + 1, a), jnp.where(below, b, mid)

                j0, _ = jax.lax.while_loop(lambda c: c[0] < c[1], bs,
                                           (I32(0), n))

                def walk(c):
                    j, blen, bpos = c
                    pos = bucket_pos[lo + j]
                    ml = equal_len(pos, i, I32(msl))
                    closer = jnp.abs(pos - pred) < jnp.abs(bpos - pred)
                    take_new = ml > blen
                    tie_swap = (ml == blen) & closer
                    bpos = jnp.where(take_new | tie_swap, pos, bpos)
                    blen = jnp.where(take_new, ml, blen)
                    return j + 1, blen, bpos

                def cond(c):
                    j = c[0]
                    return (j < n) & (bucket_pos[lo + j] < pred + mrd)

                _, blen, bpos = jax.lax.while_loop(cond, walk,
                                                   (j0, I32(0), I32(0)))
                return blen, bpos

            return jax.lax.cond(sd >= 0, run, lambda _: (I32(0), I32(0)),
                                None)

        # -- factor stack --------------------------------------------------
        def push(fac, fp, dpos, kind, rpos, length, do):
            idx = jnp.where(do, fp, I32(Fmax))  # row Fmax = discard slot
            fac = fac.at[idx].set(
                jnp.stack([dpos, kind, rpos, length]).astype(I32))
            return fac, fp + do.astype(I32)

        def amend_len(fac, fp, delta, do):
            idx = jnp.where(do, fp - 1, I32(Fmax))
            fac = fac.at[idx, 3].add(delta.astype(I32))
            return fac

        # -- aligned-range emission (parser.cpp:210-248) --------------------
        def emit_aligned(fac, fp, dpos, rpos, length, backward):
            flag0 = jnp.where(backward, I32(F_DISTANT), I32(F_CLOSE))

            def body(j, c):
                fac, fp, run, matching, flag = c
                eq = refbuf[rpos + j] == qbuf[dpos + j]
                # eq & matching: run+1
                # eq & !matching: push LIT(run) if run; run=1, matching=1
                # !eq & matching: push flag(run); run=1, matching=0, flag=CLOSE
                # !eq & !matching: run+1
                push_lit = eq & ~matching & (run > 0)
                fac, fp = push(fac, fp, dpos + j - run, I32(F_LIT), I32(0),
                               run, push_lit)
                push_m = ~eq & matching
                fac, fp = push(fac, fp, dpos + j - run, flag, rpos + j - run,
                               run, push_m)
                new_run = jnp.where(eq == matching, run + 1, I32(1))
                new_flag = jnp.where(push_m, I32(F_CLOSE), flag)
                return fac, fp, new_run, eq, new_flag

            fac, fp, run, matching, flag = jax.lax.fori_loop(
                0, length, body,
                (fac, fp, I32(0), jnp.bool_(False), flag0))
            fac, fp = push(fac, fp, dpos + length - run, flag,
                           rpos + length - run, run, (length > 0) & matching)
            fac, fp = push(fac, fp, dpos + length - run, I32(F_LIT), I32(0),
                           run, (length > 0) & ~matching & (run > 0))
            return fac, fp

        # -- two-sided gap alignment (parser.cpp:251-374) -------------------
        def emit_gap(fac, fp, dpos, r_left, r_right, length):
            to_scan = jnp.where(r_right < r_left, length,
                                jnp.minimum(r_right - r_left, length))

            lhs_nm = jnp.zeros(mqd + 2, I32)
            lhs_eq = jnp.zeros(mqd + 2, jnp.bool_)

            def lbody(j, c):
                nm_arr, eq_arr, nm = c
                eq = refbuf[r_left + j] == qbuf[dpos + j]
                nm = nm + eq.astype(I32)
                return nm_arr.at[j + 1].set(nm), eq_arr.at[j + 1].set(eq), nm

            lhs_nm, lhs_eq, _ = jax.lax.fori_loop(
                0, to_scan, lbody, (lhs_nm, lhs_eq, I32(0)))

            rhs_nm = jnp.zeros(mqd + 2, I32)
            rhs_eq = jnp.zeros(mqd + 2, jnp.bool_)
            r_lim = jnp.minimum(to_scan, r_right)

            def rbody(j, c):
                nm_arr, eq_arr, nm = c
                eq = refbuf[r_right - j] == qbuf[dpos + length - j]
                nm = nm + eq.astype(I32)
                return nm_arr.at[j].set(nm), eq_arr.at[j].set(eq), nm

            # j runs 1..r_lim (fori is half-open, so 1..r_lim+1)
            rhs_nm, rhs_eq, _ = jax.lax.fori_loop(
                1, r_lim + 1, rbody, (rhs_nm, rhs_eq, I32(0)))

            def sbody(j, c):
                best, split = c
                tot = lhs_nm[j] + rhs_nm[to_scan - j]
                upd = tot >= best  # >= : rightmost split wins ties
                return jnp.where(upd, tot, best), jnp.where(upd, j, split)

            _, split = jax.lax.fori_loop(0, to_scan + 1, sbody,
                                         (I32(0), I32(0)))

            # --- store left
            def store_left(c):
                fac, fp = c
                eq1 = lhs_eq[1]
                kind1 = jnp.where(eq1, I32(F_CLOSE), I32(F_LIT))
                fac, fp = push(fac, fp, dpos, kind1,
                               jnp.where(eq1, r_left, I32(0)), I32(1),
                               jnp.bool_(True))

                def lstore(j, c):
                    fac, fp = c
                    eq = lhs_eq[j]
                    kind = jnp.where(eq, I32(F_CLOSE), I32(F_LIT))
                    merge = kind == fac[fp - 1, 1]
                    fac = amend_len(fac, fp, I32(1), merge)
                    fac, fp = push(fac, fp, dpos + j - 1, kind,
                                   jnp.where(eq, r_left + j - 1, I32(0)),
                                   I32(1), ~merge)
                    return fac, fp

                return jax.lax.fori_loop(2, split + 1, lstore, (fac, fp))

            fac, fp = jax.lax.cond(split > 0, store_left, lambda c: c,
                                   (fac, fp))

            # --- store middle
            def store_mid(c):
                fac, fp = c
                merge = (split > 0) & (fac[fp - 1, 1] == F_LIT)
                fac = amend_len(fac, fp, length - to_scan, merge)
                fac, fp = push(fac, fp, dpos + split, I32(F_LIT), I32(0),
                               length - to_scan, ~merge)
                return fac, fp

            fac, fp = jax.lax.cond(to_scan < length, store_mid, lambda c: c,
                                   (fac, fp))

            # --- store right
            def store_right(c):
                fac, fp = c
                shift = length - to_scan
                from_right = to_scan - split
                eq = rhs_eq[from_right]
                kind = jnp.where(eq, I32(F_CLOSE), I32(F_LIT))
                dp0 = dpos + split + shift
                merge = (~eq & ((split > 0) | (shift > 0))
                         & (fac[fp - 1, 1] == F_LIT))
                fac = amend_len(fac, fp, I32(1), merge)
                fac, fp = push(fac, fp, dp0, kind,
                               jnp.where(eq, r_right - from_right, I32(0)),
                               I32(1), ~merge)
                # NOTE: when merged, the data cursor is NOT advanced
                # (reference parser.cpp:355-358)
                dp = jnp.where(merge, dp0, dp0 + 1)

                def rstore(c):
                    j, dp, fac, fp = c
                    eq = rhs_eq[j]
                    kind = jnp.where(eq, I32(F_CLOSE), I32(F_LIT))
                    merge = kind == fac[fp - 1, 1]
                    fac = amend_len(fac, fp, I32(1), merge)
                    fac, fp = push(fac, fp, dp, kind,
                                   jnp.where(eq, r_right - j, I32(0)),
                                   I32(1), ~merge)
                    return j - 1, dp + 1, fac, fp

                _, _, fac, fp = jax.lax.while_loop(
                    lambda c: c[0] > 0, rstore, (from_right - 1, dp, fac, fp))
                return fac, fp

            fac, fp = jax.lax.cond(split < to_scan, store_right, lambda c: c,
                                   (fac, fp))
            return fac, fp

        # -- approximate extensions (parser.cpp:377-441) --------------------
        def extend(dpos, rpos, max_len, forward):
            win = jnp.zeros(aw, I32)

            def body(c):
                e, bad, run, last, win = c
                d = jnp.where(forward, dpos + e, dpos - e - 1)
                r = jnp.where(forward, rpos + e, rpos - e - 1)
                miss = (qbuf[d] != refbuf[r]).astype(I32)
                bad = bad - win[e % aw] + miss
                win = win.at[e % aw].set(miss)
                run = jnp.where(miss == 0, run + 1, I32(0))
                last = jnp.where((miss == 0) & (run >= ar), e + 1, last)
                stop = bad > am
                return jnp.where(stop, -e - 1, e + 1), bad, run, last, win

            def cond(c):
                e = c[0]
                in_range = jnp.where(
                    forward,
                    (dpos + e < q_true) & (rpos + e < ref_true),
                    (dpos - e > 0) & (rpos - e > 0) & (e < max_len))
                return (e >= 0) & in_range

            _, _, _, last, _ = jax.lax.while_loop(
                cond, body, (I32(0), I32(0), I32(ar), I32(0), win))
            return last

        # -- the main automaton (parser.cpp:482-716) ------------------------
        fac0 = jnp.zeros((Fmax + 1, 4), I32)

        def step(st):
            i, pred, lit_run, reg_lo, reg_hi, fac, fp = st

            synced = pred >= 0
            s_len, s_pos = jax.lax.cond(
                synced, lambda _: seed_search(i, pred, lit_run),
                lambda _: (I32(0), I32(0)), None)
            a_len, a_pos = anchor_search(i)

            best_len, best_pos = jax.lax.cond(
                synced,
                lambda _: combine_synced(s_len, s_pos, a_len, a_pos,
                                         lit_run),
                lambda _: (a_len, a_pos), None)

            def on_match(st):
                i, pred, lit_run, reg_lo, reg_hi, fac, fp = st
                close = synced & (jnp.abs(best_pos - pred) <= mrd)

                def close_branch(c):
                    fac, fp, reg_lo = c
                    fac, fp = emit_gap(fac, fp, i - lit_run, pred - lit_run,
                                       best_pos + best_len, lit_run)
                    fac, fp = push(fac, fp, i, I32(F_CLOSE), best_pos,
                                   best_len, jnp.bool_(True))
                    return fac, fp, reg_lo

                def distant_branch(c):
                    fac, fp, reg_lo = c
                    fac, fp = push(fac, fp, i - lit_run, I32(F_LIT), I32(0),
                                   lit_run, lit_run > 0)

                    # region kill (parser.cpp:643-657)
                    def kill(c):
                        fac, fp = c

                        def pop_reg(c):
                            fac, fp = c
                            return fac, fp - 1

                        fac, fp = jax.lax.while_loop(
                            lambda c: (c[1] > 0)
                            & (c[0][c[1] - 1, 0] >= reg_lo), pop_reg,
                            (fac, fp))
                        run_len = i - reg_lo

                        def pop_lit(c):
                            fac, fp, run_len = c
                            return fac, fp - 1, run_len + fac[fp - 1, 3]

                        fac, fp, run_len = jax.lax.while_loop(
                            lambda c: (c[1] > 0) & (c[0][c[1] - 1, 1] == F_LIT),
                            pop_lit, (fac, fp, run_len))
                        fac, fp = push(fac, fp, i - run_len, I32(F_LIT),
                                       I32(0), run_len, jnp.bool_(True))
                        return fac, fp

                    do_kill = (reg_lo >= 0) & (reg_hi - reg_lo < reg)
                    fac, fp = jax.lax.cond(do_kill, kill, lambda c: c,
                                           (fac, fp))
                    reg_lo2 = jnp.where(do_kill, I32(-1), reg_lo)

                    # backward extension into the trailing literal run
                    tail_lit = (fp > 0) & (fac[fp - 1, 1] == F_LIT)
                    bwd = jax.lax.cond(
                        tail_lit,
                        lambda _: extend(i, best_pos, fac[fp - 1, 3],
                                         jnp.bool_(False)),
                        lambda _: I32(0), None)

                    def do_bwd(c):
                        fac, fp = c
                        fac = amend_len(fac, fp, -bwd, jnp.bool_(True))
                        fp = jnp.where(fac[fp - 1, 3] == 0, fp - 1, fp)
                        fac, fp = emit_aligned(fac, fp, i - bwd,
                                               best_pos - bwd, bwd,
                                               jnp.bool_(True))
                        return fac, fp

                    use_bwd = tail_lit & (bwd > 0)
                    fac, fp = jax.lax.cond(use_bwd, do_bwd, lambda c: c,
                                           (fac, fp))
                    flag = jnp.where(use_bwd, I32(F_CLOSE), I32(F_DISTANT))
                    reg_lo3 = jnp.where(use_bwd, i - bwd, reg_lo2)

                    fac, fp = push(fac, fp, i, flag, best_pos, best_len,
                                   jnp.bool_(True))
                    reg_lo4 = jnp.where(flag == F_DISTANT, i, reg_lo3)

                    # rescan for the last distant match (parser.cpp:678-684)
                    def rescan(_):
                        def rb(c):
                            j, found = c
                            hit = fac[j, 1] == F_DISTANT
                            return (jnp.where(hit, I32(-1), j - 1),
                                    jnp.where(hit, fac[j, 0], found))

                        _, found = jax.lax.while_loop(
                            lambda c: c[0] >= 0, rb, (fp - 1, I32(-1)))
                        return found

                    reg_lo5 = jax.lax.cond(reg_lo4 < 0, rescan,
                                           lambda _: reg_lo4, None)
                    return fac, fp, reg_lo5

                fac, fp, reg_lo = jax.lax.cond(close, close_branch,
                                               distant_branch,
                                               (fac, fp, reg_lo))

                i = i + best_len
                pred = best_pos + best_len
                lit_run = I32(0)

                ext = extend(i, pred, I32(0), jnp.bool_(True))
                fac, fp = emit_aligned(fac, fp, i, pred, ext,
                                       jnp.bool_(False))
                i = i + ext
                pred = pred + ext
                reg_hi = i
                return i, pred, lit_run, reg_lo, reg_hi, fac, fp

            def on_literal(st):
                i, pred, lit_run, reg_lo, reg_hi, fac, fp = st
                return (i + 1, pred + 1, lit_run + 1, reg_lo, reg_hi, fac, fp)

            st = jax.lax.cond(best_len >= msl, on_match, on_literal,
                              (i, pred, lit_run, reg_lo, reg_hi, fac, fp))
            i, pred, lit_run, reg_lo, reg_hi, fac, fp = st
            pred = jnp.where(lit_run > mqd, -q_true, pred)  # desync (:706)
            return i, pred, lit_run, reg_lo, reg_hi, fac, fp

        init = (I32(0), -q_true, I32(0), I32(-1), I32(0), fac0,
                I32(0))
        i, pred, lit_run, _, _, fac, fp = jax.lax.while_loop(
            lambda st: st[0] + msl < q_true, step, init)

        # tail (parser.cpp:710-713)
        def tail_unsynced(c):
            fac, fp = c
            return push(fac, fp, i - lit_run, I32(F_LIT), I32(0),
                        lit_run + (q_true - i), jnp.bool_(True))

        def tail_synced(c):
            fac, fp = c
            return emit_aligned(fac, fp, i - lit_run, pred - lit_run - msl,
                                lit_run + (q_true - i), jnp.bool_(False))

        fac, fp = jax.lax.cond(pred < 0, tail_unsynced, tail_synced,
                               (fac, fp))

        stats = _component_stats(fac, fp, reg)
        return stats, fac, fp

    return parse_one



def _component_stats(fac, fp, reg):
    """Fold the factor list into (sym_in_matches, sym_in_literals,
    components) — parser.cpp:734-783."""

    def body(j, c):
        tm, tl, nc, cm, cl, pend = c
        kind = fac[j, 1]
        ln = fac[j, 3]
        is_d = kind == F_DISTANT
        is_c = kind == F_CLOSE
        keep = is_d & (cm > 0) & (cm + cl >= reg)
        tm = jnp.where(keep, tm + cm, tm)
        tl = jnp.where(keep, tl + cl, tl)
        nc = jnp.where(keep, nc + 1, nc)
        cm = jnp.where(is_d, ln, jnp.where(is_c, cm + ln, cm))
        cl = jnp.where(is_d, I32(0), jnp.where(is_c, cl + pend, cl))
        pend = jnp.where(is_d, I32(0),
                         jnp.where(is_c, I32(0), pend + ln))
        return tm, tl, nc, cm, cl, pend

    tm, tl, nc, cm, cl, _ = jax.lax.fori_loop(
        0, fp, body, (I32(0),) * 6)
    keep = (cm > 0) & (cm + cl >= reg)
    tm = jnp.where(keep, tm + cm, tm)
    tl = jnp.where(keep, tl + cl, tl)
    nc = jnp.where(keep, nc + 1, nc)
    return jnp.stack([tm, tl, nc])
