"""Exactness tests for the device-side arbitration / anchor-join tables."""

import math

import numpy as np

from lzani_tpu.ops.anchor_tables import (SAT, build_anchor_join,
                                         build_win_table, kmer_stream_np,
                                         win_lookup)


def fpow_scalar(base: float, e: int) -> float:
    """Bit-exact replica of the reference fpow (parser.h:174-188)."""
    e &= 0xFFFFFFFF
    r = 1.0
    while e:
        if e & 1:
            r *= base
        base *= base
        e //= 2
    return r


def prob_len_scalar(length: int) -> float:
    if length < 30:
        return math.ldexp(1.0, -2 * length)
    return math.pow(4.0, -length)


def reference_arbitration(al, sl, lr, nr, mrd) -> bool:
    """The reference's f64 comparison, straight off parser.cpp:612-622."""
    pa = fpow_scalar(1.0 - prob_len_scalar(al), (2 * (nr + 1 - al)))
    pc = fpow_scalar(1.0 - prob_len_scalar(sl),
                     (lr + mrd + 1 - sl) & 0xFFFFFFFF)
    return pa > pc


def test_win_table_matches_reference_everywhere():
    nr = 84251  # arbitrary composite-buffer length
    mal, msl, mrd, mqd = 11, 7, 40, 40
    win = build_win_table(nr, mal, msl, mrd, mqd)
    rng = np.random.RandomState(0)
    # exhaustive over the table range, sampled beyond the saturation point
    for al in list(range(mal, SAT + 1)) + [28, 40, 100, 5000, nr]:
        for sl in list(range(msl, SAT + 1)) + [30, 81, 2000]:
            for lr in range(0, mqd + 1, 5):
                got = win_lookup(win, al, sl, lr, mal, msl)
                want = reference_arbitration(al, sl, lr, nr, mrd)
                assert got == want, (al, sl, lr, got, want)


def test_win_table_other_params():
    nr = 1203
    mal, msl, mrd, mqd = 5, 3, 10, 20
    win = build_win_table(nr, mal, msl, mrd, mqd)
    for al in range(mal, 35):
        for sl in range(msl, 35):
            for lr in range(0, mqd + 1):
                got = win_lookup(win, al, sl, lr, mal, msl)
                want = reference_arbitration(al, sl, lr, nr, mrd)
                assert got == want, (al, sl, lr)


def test_anchor_join_brute_force():
    rng = np.random.RandomState(1)
    buf = rng.randint(0, 5, 500).astype(np.uint8)  # includes N codes (4)
    mal = 4
    start, count, pos_s = build_anchor_join(buf, mal)
    km = kmer_stream_np(buf, mal)
    for v in rng.randint(0, 1 << (2 * mal), 50):
        want = [p for p in range(len(buf)) if km[p] == v]
        got = pos_s[start[v]:start[v] + count[v]].tolist()
        assert got == want
