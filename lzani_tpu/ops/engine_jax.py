"""Single-host device engine: per-reference index build + vmapped pair parse.

Shapes are bucketed to powers of two so XLA compiles a small number of
variants; padding symbols are N codes, which can never match (the reference's
own masking trick, defs.h:24-30), and true lengths bound every extension.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import prep
from .parse import ParseCfg, make_pair_parser

MIN_BUCKET = 256


def bucket_len(n: int) -> int:
    b = MIN_BUCKET
    while b < n:
        b *= 2
    return b


def table_size_for(buf_len: int) -> int:
    return 2 * prep.pow2_floor(buf_len * 10)


@lru_cache(maxsize=64)
def _jit_build_index(Lr: int, table_size: int, mal: int, msl: int):
    @jax.jit
    def build(refbuf, ref_true):
        anchors = prep.kmer_stream(refbuf, mal)
        seeds = prep.kmer_stream(refbuf, msl)
        tab, tmask = prep.build_anchor_table(anchors, table_size, ref_true)
        bucket_pos, bucket_lo, bucket_cnt = prep.build_seed_buckets(seeds, msl)
        return tab, tmask, bucket_pos, bucket_lo, bucket_cnt

    return build


@lru_cache(maxsize=64)
def _jit_query_prep(Lq: int, mal: int, msl: int):
    @jax.jit
    def qprep(qbufs):
        seeds = jax.vmap(lambda b: prep.kmer_stream(b, msl))(qbufs)
        anchors = jax.vmap(lambda b: prep.kmer_stream(b, mal))(qbufs)
        return seeds, anchors

    return qprep


@lru_cache(maxsize=64)
def _jit_parse_batch(cfg: ParseCfg, Lr: int, Lq: int, table_size: int,
                     want_factors: bool):
    parse_one = make_pair_parser(cfg, Lr, Lq, table_size)

    @jax.jit
    def run(refbuf, ref_true, tab, tmask, bucket_pos, bucket_lo, bucket_cnt,
            qbufs, q_trues, q_seeds, q_anchors):
        def one(qbuf, q_true, seeds, anchors):
            stats, fac, fp = parse_one(refbuf, ref_true, tab, tmask,
                                       bucket_pos, bucket_lo, bucket_cnt,
                                       qbuf, q_true, seeds, anchors)
            if want_factors:
                return stats, fac, fp
            return stats

        return jax.vmap(one)(qbufs, q_trues, q_seeds, q_anchors)

    return run


class RefIndexJax:
    """Device-resident index for one reference sequence."""

    def __init__(self, codes: np.ndarray, params):
        self.cfg = ParseCfg.from_params(params)
        mrd = params.max_dist_in_ref
        true_len = 2 * len(codes) + 3 * mrd
        # guard band: the parse may read a few symbols past the semantic
        # end (reference tail-emission semantics); keep N padding there
        self.Lr = bucket_len(true_len + params.max_dist_in_query
                             + params.min_seed_len + 64)
        self.table_size = table_size_for(self.Lr)
        buf = prep.ref_buffer_np(codes, mrd, pad_to=self.Lr)
        self.refbuf = jnp.asarray(buf)
        self.ref_true = jnp.int32(true_len)
        build = _jit_build_index(self.Lr, self.table_size,
                                 self.cfg.mal, self.cfg.msl)
        (self.tab, self.tmask, self.bucket_pos, self.bucket_lo,
         self.bucket_cnt) = build(self.refbuf, self.ref_true)

    def parse_batch(self, qcodes: list[np.ndarray], params,
                    want_factors: bool = False):
        mrd = params.max_dist_in_ref
        true_lens = [len(q) + mrd for q in qcodes]
        Lq = bucket_len(max(true_lens))
        qbufs = np.stack([prep.query_buffer_np(q, mrd, pad_to=Lq)
                          for q in qcodes])
        qbufs = jnp.asarray(qbufs)
        q_trues = jnp.asarray(true_lens, jnp.int32)
        seeds, anchors = _jit_query_prep(Lq, self.cfg.mal, self.cfg.msl)(qbufs)
        run = _jit_parse_batch(self.cfg, self.Lr, Lq, self.table_size,
                               want_factors)
        return run(self.refbuf, self.ref_true, self.tab, self.tmask,
                   self.bucket_pos, self.bucket_lo, self.bucket_cnt,
                   qbufs, q_trues, seeds, anchors)


def parse_pair_jax(ref_codes: np.ndarray, q_codes: np.ndarray, params,
                   want_factors: bool = False):
    """Single-pair entry point (tests / oracle diffing)."""
    idx = RefIndexJax(ref_codes, params)
    out = idx.parse_batch([q_codes], params, want_factors)
    if want_factors:
        stats, fac, fp = out
        n = int(fp[0])
        return tuple(int(x) for x in np.asarray(stats[0])), np.asarray(fac[0][:n])
    return tuple(int(x) for x in np.asarray(out[0]))


def all2all_jax(codes: list[np.ndarray], params, filter_csr=None,
                batch_size: int = 512, progress=None) -> np.ndarray:
    """All-vs-all on the device engine. Output layout matches
    native_engine.all2all (dense (n, n-1, 3) or CSR-aligned (nnz, 3)).

    progress: optional callable(pairs_done, total_pairs, seqs_done,
    total_seqs), invoked after each reference row — the two counters the
    reference prints at -V 2 (lz_matcher.cpp:187-264)."""
    n = len(codes)
    if filter_csr is None:
        out = np.zeros((n, max(n - 1, 0), 3), dtype=np.int32)
        total_pairs = n * (n - 1)
    else:
        indptr, ids = filter_csr
        out = np.zeros((len(ids), 3), dtype=np.int32)
        total_pairs = len(ids)
    pairs_done = 0

    for r in range(n):
        if filter_csr is None:
            q_ids = [q for q in range(n) if q != r]
        else:
            q_ids = [int(q) for q in ids[indptr[r]:indptr[r + 1]]]
        if not q_ids:
            if progress is not None:
                progress(pairs_done, total_pairs, r + 1, n)
            continue
        idx = RefIndexJax(codes[r], params)
        # group queries into buckets of equal padded length to bound padding
        order = sorted(range(len(q_ids)), key=lambda k: len(codes[q_ids[k]]))
        for s in range(0, len(order), batch_size):
            sel = order[s:s + batch_size]
            stats = idx.parse_batch([codes[q_ids[k]] for k in sel], params)
            stats = np.asarray(stats)
            for row, k in enumerate(sel):
                q = q_ids[k]
                if filter_csr is None:
                    slot = q - 1 if q > r else q
                    out[r, slot] = stats[row]
                else:
                    out[int(indptr[r]) + k] = stats[row]
        pairs_done += len(q_ids)
        if progress is not None:
            progress(pairs_done, total_pairs, r + 1, n)
    return out
