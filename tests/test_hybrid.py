"""Hybrid CPU+TPU scheduler: native thread pool and the device engine
stealing reference rows from one shared atomic queue (the P1 dynamic-row
scheduling of lz_matcher.cpp:184-270 extended across heterogeneous
executors). Interpret mode stands in for the TPU; the contract is exact
equality with the pure-native run."""

import os

import numpy as np
import pytest

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops.pallas_engine import all2all_hybrid
from lzani_tpu.params import Params


def _codes(n, rng, lo=250, hi=700):
    out = []
    base = rng.randint(0, 4, hi).astype(np.uint8)
    for k in range(n):
        L = int(rng.randint(lo, hi))
        c = base[:L].copy()
        m = rng.rand(L) < 0.1
        c[m] = (c[m] + rng.randint(1, 4, m.sum())) % 4
        out.append(c)
    # longest-first, as the store reorder guarantees
    out.sort(key=len, reverse=True)
    return out


@pytest.fixture()
def greedy_claims(monkeypatch):
    # disable the tail throttle so the (slow, interpret-mode) device side
    # deterministically claims at least one group in CI-sized runs
    monkeypatch.setenv("LZANI_TPU_HYBRID_GREEDY", "1")


@pytest.fixture()
def slow_cpu(monkeypatch):
    # hold the native pool back briefly so the interpret-mode device side
    # (whose warm-up outlasts a CI-sized CPU run) provably claims rows
    real = ne.all2all

    def delayed(codes, params, **kw):
        if kw.get("ext_counter") is not None:
            import time
            time.sleep(8.0)  # the interpret warm-up trace takes ~5 s
        return real(codes, params, **kw)

    monkeypatch.setattr(ne, "all2all", delayed)


def test_hybrid_matches_native_dense(greedy_claims, slow_cpu):
    p = Params()
    rng = np.random.RandomState(11)
    codes = _codes(10, rng)
    ref = ne.all2all(codes, p)
    stats = {}
    out = all2all_hybrid(codes, p, interpret=True, cpu_threads=1,
                         stats=stats)
    assert np.array_equal(ref, out)
    # the device side really claimed rows, and the split is a partition
    assert stats["tpu_pairs"] > 0
    assert stats["tpu_pairs"] + stats["cpu_pairs"] == 10 * 9


def test_hybrid_matches_native_filter(greedy_claims):
    p = Params()
    rng = np.random.RandomState(12)
    codes = _codes(9, rng)
    n = len(codes)
    # sparse symmetric-ish filter
    indptr = np.zeros(n + 1, np.int64)
    ids = []
    for r in range(n):
        row = sorted(set(int(q) for q in rng.choice(n, 4) if q != r))
        ids.extend(row)
        indptr[r + 1] = len(ids)
    csr = (indptr, np.array(ids, np.int32))
    ref = ne.all2all(codes, p, filter_csr=csr)
    out = all2all_hybrid(codes, p, filter_csr=csr, interpret=True,
                         cpu_threads=1)
    assert np.array_equal(ref, out)


def test_hybrid_regions_merge(tmp_path, greedy_claims):
    """Regions from both executors land in one dump (native writes the
    primary file, the device side's records are appended)."""
    p = Params()
    rng = np.random.RandomState(13)
    codes = _codes(8, rng)
    ref_regs = tmp_path / "native.regions"
    hyb_regs = tmp_path / "hybrid.regions"
    ref = ne.all2all(codes, p, region_path=str(ref_regs))
    stats = {}
    out = all2all_hybrid(codes, p, region_path=str(hyb_regs),
                         interpret=True, cpu_threads=1, stats=stats)
    assert np.array_equal(ref, out)
    assert not os.path.exists(str(hyb_regs) + ".tpu")  # merged + removed

    def as_map(path):
        return {(r, q): regs.tobytes()
                for r, q, regs in ne.read_region_dump(str(path))}

    a, b = as_map(ref_regs), as_map(hyb_regs)
    assert a == b


def test_hybrid_cpu0_delegates_to_pallas(monkeypatch):
    """cpu_threads=0 must degrade to the pure device path."""
    import lzani_tpu.ops.pallas_engine as pe

    called = {}

    def fake(codes, params, **kw):
        called["yes"] = True
        return "sentinel"

    monkeypatch.setattr(pe, "all2all_pallas", fake)
    r = pe.all2all_hybrid([np.zeros(10, np.uint8)], Params(),
                          cpu_threads=0, interpret=True)
    assert called.get("yes") and r == "sentinel"


def test_claim_rows_is_atomic_across_engines():
    """The C helper and the native workers share one counter: claims never
    overlap and cover every row exactly once."""
    import ctypes as ct
    import threading

    lib = ne.get_lib()
    ctr = np.zeros(1, np.int64)
    ptr = ctr.ctypes.data_as(ct.POINTER(ct.c_int64))
    claimed = []
    lock = threading.Lock()

    def claimer(k):
        got = []
        while True:
            s = int(lib.lza_claim_rows(ptr, k))
            if s >= 5000:
                break
            got.extend(range(s, min(s + k, 5000)))
        with lock:
            claimed.extend(got)

    ts = [threading.Thread(target=claimer, args=(k,))
          for k in (1, 4, 4, 7)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(claimed) == list(range(5000))
