"""Pallas kernel semantics on CPU (interpret mode) vs the native oracle.
The full-scale TPU validation lives in scripts/test_kernel_vir61.py; this
keeps the contract pinned in CI-sized tests."""

import numpy as np

from lzani_tpu.core import native_engine as ne
from lzani_tpu.ops.pallas_engine import PallasRefIndex, all2all_pallas
from lzani_tpu.params import Params


def _check(ref, q, p):
    ev_o = ne.parse_event_log(ref, q, p)
    idx = PallasRefIndex(ref, p, interpret=True)
    ev_k = idx.parse_events(q)
    assert np.array_equal(ev_o, ev_k)
    st_o, regs_o = ne.parse_pair(ref, q, p, want_regions=True)
    st_k, regs_k = ne.replay_events(ref, q, p, ev_k, want_regions=True)
    assert st_o == st_k
    assert np.array_equal(regs_o, regs_k)


def test_kernel_matches_oracle_mixed_paths():
    p = Params()
    rng = np.random.RandomState(3)
    ref = rng.randint(0, 4, 600).astype(np.uint8)
    # close matches + kills + desync: moderate mutation with a spliced gap
    q = ref.copy()
    m = rng.rand(600) < 0.12
    q[m] = (q[m] + rng.randint(1, 4, m.sum())) % 4
    q = np.concatenate([q[:200], rng.randint(0, 4, 150).astype(np.uint8),
                        q[350:]])
    _check(ref, q, p)


def test_kernel_matches_oracle_repeats():
    p = Params()
    rng = np.random.RandomState(4)
    unit = rng.randint(0, 4, 37).astype(np.uint8)
    ref = np.tile(unit, 12)
    q = ref.copy()
    q[::41] = (q[::41] + 1) % 4
    _check(ref, q[:400], p)


def test_kernel_batch_and_fallback():
    p = Params()
    rng = np.random.RandomState(5)
    ref = rng.randint(0, 4, 500).astype(np.uint8)
    qs = [ref[:450].copy(), rng.randint(0, 4, 300).astype(np.uint8)]
    idx = PallasRefIndex(ref, p, interpret=True)
    evs = idx.parse_events_batch(qs)
    for q, ev in zip(qs, evs):
        assert ev is not None
        assert np.array_equal(ne.parse_event_log(ref, q, p), ev)


def test_all2all_pallas_multidevice_roundrobin():
    """Real multi-device distribution: units round-robin over the virtual
    CPU devices, per-unit buffers live on the unit's device, and the
    merged result equals the native engine."""
    import jax

    from lzani_tpu.ops import pallas_engine as pe

    p = Params()
    rng = np.random.RandomState(9)
    base = rng.randint(0, 4, 400).astype(np.uint8)
    codes = []
    for i in range(4):
        s = base.copy()
        s[:: (i + 5)] = (s[:: (i + 5)] + 1) % 4
        codes.append(s[: 400 - 11 * i])

    devs = jax.devices()[:2]
    assert len(devs) == 2, "conftest must provide the 8-device CPU mesh"

    out = pe.all2all_pallas(codes, p, devices=devs, interpret=True)
    want = ne.all2all(codes, p)
    assert np.array_equal(out, want)

    # placement: the engine replicates the query matrix per device and
    # pins each unit's dispatch to its round-robin device
    eng = pe.PallasAll2All(codes, p, devices=devs, interpret=True)
    assert set(eng.Q.keys()) == set(devs)
    for k in range(4):
        assert eng.device_for(k) == devs[k % 2]
    for k, dev in enumerate(devs):
        ev, nev, ovf = eng.dispatch_range(k, 0, dev)
        assert ev.devices() == {dev}, (ev.devices(), dev)
        assert nev.devices() == {dev}
    # cross-device results agree with the oracle event logs
    evs0 = eng.collect(eng.dispatch_range(0, 0, devs[0]))
    evs1 = eng.collect(eng.dispatch_range(1, 0, devs[1]))
    assert np.array_equal(evs0[1], ne.parse_event_log(codes[0], codes[1], p))
    assert np.array_equal(evs1[0], ne.parse_event_log(codes[1], codes[0], p))


def test_kernel_nondefault_params():
    p = Params()
    p.min_anchor_len = 9
    p.min_seed_len = 5
    p.max_dist_in_ref = 24
    p.max_dist_in_query = 30
    p.min_region_len = 20
    p.approx_window = 11
    p.approx_mismatches = 5
    p.approx_run_len = 2
    rng = np.random.RandomState(13)
    ref = rng.randint(0, 4, 700).astype(np.uint8)
    q = ref.copy()
    m = rng.rand(700) < 0.08
    q[m] = (q[m] + rng.randint(1, 4, m.sum())) % 4
    _check(ref, q[:650], p)


def test_all2all_pallas_event_overflow_fallback(monkeypatch):
    """Event-buffer overflow (both the in-kernel MAXEV stop and the
    download-side EV_CAP gate) must fall back to the native engine and
    still produce exact triples end-to-end."""
    from lzani_tpu.ops import pallas_engine as pe

    p = Params()
    rng = np.random.RandomState(33)
    ref = rng.randint(0, 4, 800).astype(np.uint8)
    # query = many scattered 12-mers of ref -> one distant event each
    parts = [ref[j:j + 12] for j in rng.randint(0, 700, 40)]
    q = np.concatenate(parts).astype(np.uint8)
    codes = [ref, q]
    # tiny capacities: pair (ref->q) produces ~40 events > both limits
    monkeypatch.setattr(pe.PallasRefIndex, "MAXEV", 32)
    monkeypatch.setattr(pe.PallasAll2All, "EV_CAP", 8)
    out = pe.all2all_pallas(codes, p, interpret=True)
    want = ne.all2all(codes, p)
    assert np.array_equal(out, want)


def test_all2all_pallas_filter_plus_alignment():
    """Sparse filter + alignment regions through the device driver in one
    run: triples AND region dumps must match the native engine."""
    import os
    import tempfile

    from lzani_tpu.ops import pallas_engine as pe

    p = Params()
    rng = np.random.RandomState(3)
    base = rng.randint(0, 4, 600).astype(np.uint8)
    codes = []
    for i in range(6):
        s = base.copy()
        m = rng.rand(600) < 0.05 * (1 + i % 3)
        s[m] = (s[m] + rng.randint(1, 4, m.sum())) % 4
        codes.append(s[:600 - 17 * i])
    rows = [[1, 2, 5], [0, 3], [0], [1], [5], [0, 4]]
    indptr = np.zeros(7, np.int64)
    ids = []
    for r, qs in enumerate(rows):
        ids.extend(qs)
        indptr[r + 1] = len(ids)
    ids = np.array(ids, np.int32)
    with tempfile.TemporaryDirectory() as td:
        rp_n = os.path.join(td, "n.regions")
        rp_p = os.path.join(td, "p.regions")
        want = ne.all2all(codes, p, filter_csr=(indptr, ids),
                          region_path=rp_n)
        got = pe.all2all_pallas(codes, p, filter_csr=(indptr, ids),
                                region_path=rp_p, interpret=True)
        assert np.array_equal(want, got)
        ka = sorted((r, q, tuple(map(tuple, regs)))
                    for r, q, regs in ne.read_region_dump(rp_n))
        kb = sorted((r, q, tuple(map(tuple, regs)))
                    for r, q, regs in ne.read_region_dump(rp_p))
        assert ka == kb


def test_all2all_pallas_vmem_fallback_logged():
    """With the big path disabled, references past MAX_REF_SYMS run on
    the native engine, exactly, with a loud -V>=1 warning (no silent
    caps). (With it enabled — the default — they run on the HBM-resident
    big kernel instead; see test_all2all_pallas_big_path.)"""
    import contextlib
    import io
    import os

    from lzani_tpu.ops import pallas_engine as pe

    p = Params()
    rng = np.random.RandomState(8)
    big = rng.randint(0, 4, 360_000).astype(np.uint8)
    codes = [big, big[:1500].copy()]
    err = io.StringIO()
    os.environ["LZANI_TPU_BIG"] = "0"
    try:
        with contextlib.redirect_stderr(err):
            got = pe.all2all_pallas(codes, p, interpret=True)
    finally:
        del os.environ["LZANI_TPU_BIG"]
    want = ne.all2all(codes, p)
    assert np.array_equal(got, want)
    assert "exceeds the device budget" in err.getvalue()


def test_all2all_pallas_big_path():
    """The HBM-resident big kernel (DMA loads, two-plane unbounded
    candidate table, sorted two-word-key join) is byte-exact vs the
    native oracle — forced onto small genomes so interpret mode stays
    fast. Covers candidate counts beyond the small path's 7-bit pack
    (tandem repeats) and mal > 13 (no dense 4^mal table)."""
    from lzani_tpu.ops import pallas_engine as pe

    rng = np.random.RandomState(11)
    unit = rng.randint(0, 4, 13).astype(np.uint8)
    rep = np.tile(unit, 150)  # ~150 copies/kmer > the 127-count pack
    base = rng.randint(0, 4, 900).astype(np.uint8)
    g1 = np.concatenate([base[:300], rep, base[300:]])
    q1 = g1.copy()
    m = rng.rand(len(q1)) < 0.05
    q1[m] = (q1[m] + rng.randint(1, 4, m.sum())) % 4
    codes = [g1, q1, base, rng.randint(0, 4, 700).astype(np.uint8)]
    old = pe.PallasAll2All.MAX_REF_SYMS
    pe.PallasAll2All.MAX_REF_SYMS = 100
    try:
        for mal, msl in ((11, 7), (20, 11)):
            p = Params()
            p.min_anchor_len = mal
            p.min_seed_len = msl
            want = ne.all2all(codes, p)
            got = pe.all2all_pallas(codes, p, interpret=True)
            assert np.array_equal(got, want), (mal, msl)
    finally:
        pe.PallasAll2All.MAX_REF_SYMS = old


def test_all2all_pallas_filter_path():
    """Sparse kmer-db filter CSR through the device driver (interpret)."""
    from lzani_tpu.ops import pallas_engine as pe

    p = Params()
    rng = np.random.RandomState(21)
    base = rng.randint(0, 4, 350).astype(np.uint8)
    codes = []
    for i in range(5):
        s = base.copy()
        s[:: (i + 4)] = (s[:: (i + 4)] + 1) % 4
        codes.append(s[: 350 - 13 * i])
    # sparse pair list: rows 0..4 with assorted partners
    rows = [[1, 3], [0], [4], [0, 2], [2]]
    indptr = np.zeros(6, np.int64)
    ids = []
    for r, qs in enumerate(rows):
        ids.extend(qs)
        indptr[r + 1] = len(ids)
    ids = np.array(ids, np.int32)
    out = pe.all2all_pallas(codes, p, filter_csr=(indptr, ids),
                            interpret=True)
    want = ne.all2all(codes, p, filter_csr=(indptr, ids))
    assert np.array_equal(out, want)


def test_device_envelope_reason():
    """Parameter sets the compiled window geometry cannot express are
    detected up front (the reference parser has no such limits —
    parser.cpp:16-34 — so these must route to the native engine, never
    crash)."""
    from lzani_tpu.ops import pallas_engine as pe

    assert pe.device_envelope_reason(Params()) is None
    p = Params()
    p.max_dist_in_query = 200          # > 7-bit tie-pack field
    assert "127" in pe.device_envelope_reason(p)
    p = Params()
    p.max_dist_in_query = 100          # <= 127 but D+msl > WROWS
    assert "window geometry" in pe.device_envelope_reason(p)
    p = Params()
    p.min_anchor_len = 31              # two-word sort keys overflow
    assert "30" in pe.device_envelope_reason(p)
    p = Params()
    p.approx_window = 200              # ext chunk is 128 lanes
    assert "128-lane" in pe.device_envelope_reason(p)


def test_out_of_envelope_falls_back_to_native(capfd):
    """--backend pallas with out-of-envelope params produces the native
    engine's exact output plus a warning (previously: AssertionError in
    the kernel factory)."""
    from lzani_tpu.ops import pallas_engine as pe

    p = Params()
    p.max_dist_in_query = 100
    rng = np.random.RandomState(31)
    base = rng.randint(0, 4, 400).astype(np.uint8)
    codes = []
    for i in range(5):
        s = base.copy()
        s[:: (i + 3)] = (s[:: (i + 3)] + 1) % 4
        codes.append(s[: 400 - 17 * i])
    want = ne.all2all(codes, p)
    seen = []

    def prog(done, total, seqs_done=0, total_seqs=0):
        seen.append((done, total))

    got = pe.all2all_pallas(codes, p, interpret=True, progress=prog)
    assert np.array_equal(got, want)
    assert "outside the device kernel envelope" in capfd.readouterr().err
    assert seen and seen[-1] == (20, 20)


def test_auto_kernel_configuration_pins():
    """The production auto configuration (what dryrun_multichip and the
    driver bench actually ship): v7 at ilv=16 small-bucket (round-5
    i8/i16 residency), minimal-legal window rows, halved forward-ext
    chunk. A deliberate change here must re-run the vir61 +
    dissimilar A/B gate (CLAUDE.md)."""
    from lzani_tpu.ops import pallas_engine as pe

    rng = np.random.RandomState(40)
    codes = [rng.randint(0, 4, 300).astype(np.uint8) for _ in range(4)]
    eng = pe.PallasAll2All(codes, Params(), interpret=True)
    assert eng.sim and eng.ilv == 16
    assert eng.wr == 48     # ceil8(D + msl_eff) = 48 at defaults
    assert eng.wc == 128    # ceil128(W + D + msl_eff) = 128 at defaults
    assert eng.cef == 256
    p = Params()
    p.max_dist_in_query = 55    # D + msl_eff = 63 -> ceil8 = 64
    eng = pe.PallasAll2All(codes, p, interpret=True)
    assert eng.wr == 64


def test_sparse_filter_dispatches_gathered_chunks():
    """A scattered kmer-db filter must dispatch the UNION of each
    group's wanted queries densely (gather path), not one unit per
    contiguous B-query window — the windowed form parsed ~100x more
    pairs than the 10k Vclust-shape filter kept (DESIGN.md round-4
    final). Pins both the dispatch count and byte-exactness."""
    from lzani_tpu.ops import pallas_engine as pe

    rng = np.random.RandomState(50)
    base = rng.randint(0, 4, 300).astype(np.uint8)
    codes = []
    for i in range(24):
        s = base.copy()
        s[:: (i % 5 + 3)] = (s[:: (i % 5 + 3)] + 1) % 4
        codes.append(s[: 300 - 2 * i])
    n = len(codes)
    # scattered partners: each ref wants 2 far-apart queries
    indptr = np.zeros(n + 1, np.int64)
    ids = []
    for r in range(n):
        qs = [(r + 7) % n, (r + 17) % n]
        ids.extend(q for q in qs if q != r)
        indptr[r + 1] = len(ids)
    ids = np.array(ids, np.int32)
    calls = []
    orig = pe.PallasAll2All.dispatch_group

    def spy(self, gidx, lo, device=None, qrows=None):
        calls.append(lo)
        return orig(self, gidx, lo, device, qrows=qrows)

    pe.PallasAll2All.dispatch_group = spy
    try:
        got = pe.all2all_pallas(codes, Params(), filter_csr=(indptr, ids),
                                interpret=True)
    finally:
        pe.PallasAll2All.dispatch_group = orig
    want = ne.all2all(codes, Params(), filter_csr=(indptr, ids))
    assert np.array_equal(got, want)
    # every unit must be a gathered row set (ndarray), one per group:
    # 24 refs / GROUP=4 = 6 groups, each group's union (8 queries)
    # fits one B-chunk
    assert calls and all(isinstance(c, np.ndarray) for c in calls)
    assert len(calls) == 6, calls


def test_qrows_memo_one_slice_per_lo():
    """Round-5 driver lever: q_rows depends only on (device, lo) — the
    slice is memoized per engine, and when n_pad == B the resident
    matrix passes straight through (identity slice, zero RPCs). Through
    the tunnel every RPC issued while an execution is in flight blocks,
    so the old per-dispatch slice jit put pure RTT on the critical path
    of every group (measured 8.68 -> 7.07 s on warm vir61;
    ops/DESIGN.md round 5)."""
    from lzani_tpu.ops import pallas_engine as pe

    rng = np.random.RandomState(60)
    base = rng.randint(0, 4, 300).astype(np.uint8)
    codes = [np.ascontiguousarray(
        np.where(rng.rand(300 - 7 * i) < 0.05,
                 (base[:300 - 7 * i] + 1) % 4,
                 base[:300 - 7 * i]).astype(np.uint8))
        for i in range(6)]
    params = Params()
    eng = pe.PallasAll2All(codes, params, interpret=True)
    dev = eng.devices[0]
    gi = eng.build_group_index([0, 1, 2, 3], dev)
    assert eng._qrows_cache == {}
    h = eng.dispatch_group(gi, 0, dev)
    eng.collect_group(h)
    assert len(eng._qrows_cache) == 1
    # n <= 64: n_pad == B, so the cached slice IS the resident matrix
    (q_rows, dsz_b), = eng._qrows_cache.values()
    assert q_rows is eng.Q[dev] and dsz_b is eng.DSZ[dev]
    # second dispatch at the same lo: no new cache entry
    gi2 = eng.build_group_index([4, 5, -1, -1], dev)
    h2 = eng.dispatch_group(gi2, 0, dev)
    eng.collect_group(h2)
    assert len(eng._qrows_cache) == 1
