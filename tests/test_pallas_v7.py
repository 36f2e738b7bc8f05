"""v7 predicated-SIMT-tail kernel (ops/pallas_v7.py): event streams at
every interleave width must be byte-identical to the v3 group path and
the native oracle. Interpret mode (CPU). The round-3 calibration that
motivates the design (alternated dependent-load chains are ~free) and
the TPU A/B live in ops/DESIGN.md round-3 notes.
"""
import numpy as np
import pytest

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops.pallas_engine import PallasAll2All
from lzani_tpu.params import Params


@pytest.fixture(scope="module")
def family():
    rng = np.random.RandomState(11)
    base = rng.randint(0, 4, 1400).astype(np.uint8)
    codes = [base.copy()]
    m = rng.rand(len(base)) < 0.05
    c = base.copy()
    c[m] = (c[m] + rng.randint(1, 4, m.sum())) % 4
    codes.append(c)
    c = base.copy()
    for _ in range(4):
        p = rng.randint(0, len(c) - 60)
        c = np.concatenate([c[:p], c[p + rng.randint(1, 40):]])
    codes.append(np.ascontiguousarray(c))
    codes.append(rng.randint(0, 4, 900).astype(np.uint8))
    c = base[300:].copy()
    c[rng.randint(0, len(c), 25)] = 4
    codes.append(np.ascontiguousarray(c))
    codes.append(rng.randint(0, 4, 320).astype(np.uint8))
    return codes


def _group_events(eng, codes, r_list):
    gi = eng.build_group_index(r_list, eng.devices[0])
    out = {}
    for lo in range(0, eng.n_pad, eng.B):
        evs = eng.collect_group(eng.dispatch_group(gi, lo,
                                                   eng.devices[0]))
        for g, r in enumerate(r_list):
            if r < 0:
                continue
            for b in range(eng.B):
                q = lo + b
                if q < len(codes) and q != r:
                    out[(r, q)] = evs[g][b]
    return out


@pytest.mark.parametrize("ilv", [2, 4])
def test_v7_matches_v3_and_oracle(family, ilv):
    codes = family
    p = Params()
    r_lists = [[0, 1, 2, 3], [4, 5, -1, -1]]
    base_eng = PallasAll2All(codes, p, interpret=True, ilv=1)
    v7_eng = PallasAll2All(codes, p, interpret=True, ilv=ilv, sim=True)
    assert v7_eng.sim
    base = {}
    got = {}
    for rl in r_lists:
        base.update(_group_events(base_eng, codes, rl))
        got.update(_group_events(v7_eng, codes, rl))
    assert set(base) == set(got) and len(base) == 30
    for (r, q), ev in base.items():
        oracle = ne.parse_event_log(codes[r], codes[q], p)
        assert ev is not None and np.array_equal(oracle, ev), (r, q)
        assert got[(r, q)] is not None
        assert np.array_equal(ev, got[(r, q)]), (r, q)
