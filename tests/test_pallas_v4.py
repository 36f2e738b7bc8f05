"""v4 lockstep kernel (K-pair interleave) vs the native oracle, interpret
mode. Every pair's event stream must equal the oracle's exactly — the
lockstep restructure may not change a single decision."""

import numpy as np

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops import pallas_engine as pe
from lzani_tpu.params import Params


def _family(n, L=520, seed=7):
    """Mixed family: mutated siblings + one random outsider + a short one
    (ragged dsz inside one K block exercises lockstep skew)."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 4, L).astype(np.uint8)
    out = []
    for i in range(n - 2):
        s = base.copy()
        m = rng.rand(L) < 0.04 * (i + 1)
        s[m] = (s[m] + rng.randint(1, 4, m.sum())) % 4
        # splice an indel to break long extensions
        cut = int(rng.randint(100, L - 120))
        s = np.concatenate([s[:cut], rng.randint(0, 4, 17).astype(np.uint8),
                            s[cut:]])[:L]
        out.append(s)
    out.append(rng.randint(0, 4, L).astype(np.uint8))      # outsider
    out.append(base[: L // 3].copy())                       # short
    return out


def test_v4_k2_events_match_oracle():
    p = Params()
    codes = _family(4)
    eng = pe.PallasAll2All(codes, p, interpret=True, kpair=2)
    for r in range(len(codes)):
        evs = eng.run_range(r, 0)
        for q in range(len(codes)):
            if q == r or q >= len(codes):
                continue
            ev_o = ne.parse_event_log(codes[r], codes[q], p)
            assert evs[q] is not None, (r, q)
            assert np.array_equal(ev_o, evs[q]), (r, q)


def test_v4_k4_all2all_triples_exact():
    p = Params()
    codes = _family(6, L=430, seed=13)
    out = pe.all2all_pallas(codes, p, interpret=True, kpair=4)
    want = ne.all2all(codes, p)
    assert np.array_equal(out, want)


def test_v4_k4_nondefault_params():
    p = Params()
    p.min_anchor_len = 9
    p.min_seed_len = 5
    p.max_dist_in_ref = 24
    p.max_dist_in_query = 30
    p.min_region_len = 20
    p.approx_window = 11
    p.approx_mismatches = 5
    p.approx_run_len = 2
    codes = _family(4, L=460, seed=23)
    out = pe.all2all_pallas(codes, p, interpret=True, kpair=4)
    want = ne.all2all(codes, p)
    assert np.array_equal(out, want)


def test_v4_matches_v3_event_streams():
    """v3 and v4 must agree event-for-event (not only on triples)."""
    p = Params()
    codes = _family(4, L=500, seed=31)
    e3 = pe.PallasAll2All(codes, p, interpret=True, kpair=1)
    e4 = pe.PallasAll2All(codes, p, interpret=True, kpair=4)
    for r in range(2):
        a = e3.run_range(r, 0)
        b = e4.run_range(r, 0)
        for q in range(len(codes)):
            if q == r:
                continue
            assert (a[q] is None) == (b[q] is None), (r, q)
            if a[q] is not None:
                assert np.array_equal(a[q], b[q]), (r, q)
