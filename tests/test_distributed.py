"""Multi-host skeleton dry-run: simulate an N-host launch on the CPU mesh
(each "host" gets a device subset and its stride partition of reference
rows), merge the per-host triples, and check against the oracle."""

import numpy as np

import jax

from lzani_tpu.core import native_engine as ne
from lzani_tpu.parallel.distributed import (all2all_multihost,
                                            local_filter_csr,
                                            merge_host_triples,
                                            partition_refs)
from lzani_tpu.params import Params


def _codes(n, seed=41):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 4, 380).astype(np.uint8)
    out = []
    for i in range(n):
        s = base.copy()
        s[:: (i + 4)] = (s[:: (i + 4)] + 1) % 4
        out.append(s[: 380 - 7 * i])
    return out


def test_partition_covers_all_rows():
    for n_hosts in (1, 2, 3, 5):
        got = np.sort(np.concatenate(
            [partition_refs(13, n_hosts, h) for h in range(n_hosts)]))
        assert np.array_equal(got, np.arange(13))


def test_two_host_dense_merge_matches_oracle():
    p = Params()
    codes = _codes(5)
    n = len(codes)
    devs = jax.devices()
    per_host = []
    total = None
    for h in range(2):
        slots, triples, total = all2all_multihost(
            codes, p, interpret=True,
            devices=[devs[h % len(devs)]], process_id=h, num_processes=2)
        per_host.append((slots, triples))
    merged = merge_host_triples(total, per_host)
    want = ne.all2all(codes, p).reshape(-1, 3)
    assert np.array_equal(merged, want)


def test_two_host_filter_merge_matches_oracle():
    p = Params()
    codes = _codes(6)
    n = len(codes)
    rows = [[1, 2], [0], [0, 5], [4], [3], [2]]
    indptr = np.zeros(n + 1, np.int64)
    ids = []
    for r, qs in enumerate(rows):
        ids.extend(qs)
        indptr[r + 1] = len(ids)
    ids = np.array(ids, np.int32)
    csr = (indptr, ids)

    per_host = []
    total = None
    for h in range(2):
        slots, triples, total = all2all_multihost(
            codes, p, filter_csr=csr, interpret=True,
            process_id=h, num_processes=2)
        per_host.append((slots, triples))
    merged = merge_host_triples(total, per_host)
    want = ne.all2all(codes, p, filter_csr=csr)
    assert np.array_equal(merged, want.reshape(-1, 3))


def test_local_filter_csr_slots_disjoint_and_complete():
    n = 7
    all_slots = []
    for h in range(3):
        rows = partition_refs(n, 3, h)
        _, _, slots = local_filter_csr(rows, n)
        all_slots.append(slots)
    cat = np.sort(np.concatenate(all_slots))
    assert np.array_equal(cat, np.arange(n * (n - 1)))


def test_slot_halves_roundtrip_beyond_int32():
    """The multi-host transport ships int64 slot indices as two int32
    halves (x64 is disabled under jax, so raw int64 would silently
    truncate). Round-trip must be exact past 2^31 — dense slot ids cross
    it from ~46k genomes."""
    from lzani_tpu.parallel.distributed import (join_slots_i32,
                                                split_slots_i32)

    s = np.array([0, 1, 2**31 - 1, 2**31, 2**31 + 7, 2**40 + 123,
                  46342 * 46341 - 1], np.int64)
    lo, hi = split_slots_i32(s)
    assert lo.dtype == np.int32 and hi.dtype == np.int32
    assert np.array_equal(join_slots_i32(lo, hi), s)
    rng = np.random.RandomState(0)
    s = rng.randint(0, 2**62, 1000).astype(np.int64)
    lo, hi = split_slots_i32(s)
    assert np.array_equal(join_slots_i32(lo, hi), s)
