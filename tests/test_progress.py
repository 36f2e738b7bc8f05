"""Progress + CLI error parity (VERDICT r2 item 5).

The reference prints `Sequences: x%    Pairs: y%` at -V 2 for every run
(lz_matcher.cpp:187-264) and a clean "Cannot open file:" for a missing
--in-txt (lz-ani.cpp:88-102). Every backend here must report both
counters through the progress callback, and the CLI must not traceback.
"""

import numpy as np
import pytest

from lzani_tpu.core import native_engine as ne
from lzani_tpu.params import Params


def _codes(n=4, L=320, seed=3):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 4, L).astype(np.uint8)
    out = []
    for i in range(n):
        s = base.copy()
        s[:: (i + 5)] = (s[:: (i + 5)] + 1) % 4
        out.append(s[: L - 7 * i])
    return out


def _check_calls(calls, n, total_pairs):
    assert calls, "progress was never invoked"
    # every call carries all four counters
    assert all(len(c) == 4 for c in calls)
    pairs = [c[0] for c in calls]
    seqs = [c[2] for c in calls]
    assert all(c[1] == total_pairs for c in calls)
    assert all(c[3] == n for c in calls)
    assert pairs == sorted(pairs) and seqs == sorted(seqs)
    assert calls[-1][0] == total_pairs
    assert calls[-1][2] == n


def test_pallas_progress_reports_sequences():
    from lzani_tpu.ops import pallas_engine as pe

    p = Params()
    codes = _codes()
    n = len(codes)
    calls = []
    out = pe.all2all_pallas(codes, p, interpret=True,
                            progress=lambda *a: calls.append(a))
    assert np.array_equal(out, ne.all2all(codes, p))
    _check_calls(calls, n, n * (n - 1))


def test_jax_progress_reports_sequences():
    from lzani_tpu.ops.engine_jax import all2all_jax

    p = Params()
    codes = _codes(n=3, L=200)
    n = len(codes)
    calls = []
    out = all2all_jax(codes, p, progress=lambda *a: calls.append(a))
    assert np.array_equal(out, ne.all2all(codes, p))
    _check_calls(calls, n, n * (n - 1))


def test_hybrid_progress_reports_sequences():
    # no usable device in the test env: hybrid degrades to native, and
    # the final report() still carries both counters
    from lzani_tpu.ops.hybrid import all2all_hybrid

    p = Params()
    codes = _codes()
    n = len(codes)
    calls = []
    out = all2all_hybrid(codes, p, devices=[],
                         progress=lambda *a: calls.append(a))
    assert np.array_equal(out, ne.all2all(codes, p))
    # devices=[] short-circuits to native_engine.all2all (no callback);
    # the degradation contract is covered in test_hybrid.py. Here only
    # assert the call did not crash with the 4-arg callback.


def test_matcher_progress_cb_format(capsys):
    from lzani_tpu.matcher import Matcher

    p = Params()
    p.verbosity_level = 2
    cb = Matcher(p)._make_progress_cb()
    cb(5, 10, 1, 4)
    err = capsys.readouterr().err
    assert "Sequences: 25%" in err and "Pairs: 50%" in err

    p.verbosity_level = 1
    assert Matcher(p)._make_progress_cb() is None


def test_cli_in_txt_missing_file(capsys):
    from lzani_tpu.cli import parse_args

    with pytest.raises(SystemExit) as ei:
        parse_args(["all2all", "--in-txt", "/nonexistent/names.txt",
                    "--out", "x.tsv"])
    assert ei.value.code == 1
    assert "Cannot open file: /nonexistent/names.txt" in \
        capsys.readouterr().err
