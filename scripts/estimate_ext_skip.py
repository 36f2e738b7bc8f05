"""Estimate the coverage of an in-window "forward ext == 0" proof.

The kernel calls ext_scan after EVERY event (~20% of dispatch time,
phase probes) yet ~79% of events have ext == 0. A window-precomputed
per-cell proof could skip those calls. Two candidate proofs, both
conservative (they only ever claim ext==0 when the reference scan
parser.cpp:377-409 truly returns 0):

  liteZ : the very first aw-window is already a stop (> am mismatches
          among cells 0..aw-1) AND no clean ar-run can complete before
          it (no j in [1, aw-ar] with cells j..j+ar-1 all matching).
          ~36 extra vector ops per window (2x diag_lce's cost).
  fullZ : first stop (windowed form) precedes the first clean ar-run
          anywhere within a lookahead L — the FA/FS doubling-scan
          design (~80 ops per window).

This script measures, on real vir61 event logs from the native oracle:
what fraction of events each proof would skip, and (sanity) that the
proof NEVER fires on an event with ext > 0.
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from lzani_tpu.core import native_engine as ne
from lzani_tpu.io.fasta import load_store
from lzani_tpu.ops.prep import ref_buffer_np, query_buffer_np
from lzani_tpu.params import Params

VIR61 = "/root/reference/test/vir61"
N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 200


def main():
    p = Params()
    p.input_file_names = sorted(
        os.path.join(VIR61, f) for f in os.listdir(VIR61))
    store = load_store(p)
    store.reorder()
    codes = store.codes
    aw, am, ar = p.approx_window, p.approx_mismatches, p.approx_run_len
    mrd = p.max_dist_in_ref

    rng = np.random.RandomState(7)
    tot = ext0 = lite = full = 0
    lite_bad = full_bad = 0
    L = 64  # fullZ lookahead
    for _ in range(N_PAIRS):
        r, q = rng.randint(0, len(codes), 2)
        if r == q:
            continue
        ev = ne.parse_event_log(codes[r], codes[q], p)
        if not len(ev):
            continue
        rbuf = ref_buffer_np(codes[r], mrd)
        qbuf = query_buffer_np(codes[q], mrd)
        for i_ev, pos, blen, bwd, ext in ev[:, :5]:
            tot += 1
            z = ext == 0
            ext0 += z
            i2, p2 = i_ev + blen, pos + blen
            la = min(L + aw, len(qbuf) - i2, len(rbuf) - p2)
            if la < aw:
                continue
            m = (qbuf[i2:i2 + la] != rbuf[p2:p2 + la]).astype(np.int32)
            if not m[0]:
                continue
            # liteZ: first full window stops; no ar-run start in 1..aw-ar
            if m[:aw].sum() > am:
                runs = np.array([m[j:j + ar].sum() == 0
                                 for j in range(1, aw - ar + 1)])
                if not runs.any():
                    lite += 1
                    lite_bad += not z
            # fullZ: FS = first j with window-sum(j..j+aw-1) > am;
            # FA = first j >= 1 with clean ar-run at j..j+ar-1
            w = np.convolve(m, np.ones(aw, np.int32))[aw - 1:la - aw + 1]
            stops = np.where(w > am)[0]
            rsum = np.convolve(m, np.ones(ar, np.int32))[ar - 1:la - ar + 1]
            clean = np.where(rsum[1:] == 0)[0] + 1
            if len(stops):
                FS = stops[0]
                FA = clean[0] if len(clean) else 10 ** 9
                if FA > FS + aw - ar:
                    full += 1
                    full_bad += not z
    print(f"events {tot}; ext==0 {ext0} ({100*ext0/tot:.1f}%)")
    print(f"liteZ skips {lite} ({100*lite/tot:.1f}% of events, "
          f"{100*lite/max(ext0,1):.1f}% of ext==0)  FALSE={lite_bad}")
    print(f"fullZ skips {full} ({100*full/tot:.1f}% of events, "
          f"{100*full/max(ext0,1):.1f}% of ext==0)  FALSE={full_bad}")


if __name__ == "__main__":
    main()
