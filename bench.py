#!/usr/bin/env python
"""Benchmark harness: all-vs-all ANI on the vir61 set (61 virus genomes,
the reference's CI anchor — /root/reference/test/vir61).

Prints ONE JSON line. The HEADLINE metric is the TPU event-log engine
(`--backend pallas`) on the FULL vir61 set, warm (one un-timed run first
pays the Mosaic compiles); `vs_baseline` divides it by the measured rate
of the actual reference binary (built by scripts/build_reference_binary.sh)
at max host threads — the honest "TPU build vs reference" ratio demanded
by BASELINE.md. The native C++ engine and the reference binary rates are
reported as side keys, and the device triples are asserted byte-equal to
the native engine's.

Env toggles:
  BENCH_SKIP_PALLAS=1  skip the device measurement (headline falls back to
                       the native engine)
  BENCH_PALLAS_FAST=1  measure the device engine on a 12-genome subset
                       (one shape bucket; quick smoke)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

VIR61 = "/root/reference/test/vir61"
REF_BIN = "/tmp/lzani_ref"


def load_vir61():
    from lzani_tpu.params import Params

    p = Params()
    if os.path.isdir(VIR61):
        p.input_file_names = sorted(
            os.path.join(VIR61, f) for f in os.listdir(VIR61))
    else:
        p.input_file_names = [
            os.path.join(REPO, "tests", "data", "multifasta.fna")]
    from lzani_tpu.io.fasta import load_store

    store = load_store(p)
    store.reorder()
    return p, store


def reference_cmd(threads: int) -> list[str] | None:
    """Build (once) + warm the reference binary; return its vir61
    invocation, or None when unavailable. Timing happens at the caller
    (interleaved with the engines it is ratioed against)."""
    if not os.path.isdir(VIR61):
        return None
    try:
        if not os.path.exists(REF_BIN):
            subprocess.run(
                ["bash", os.path.join(REPO, "scripts",
                                      "build_reference_binary.sh")],
                check=True, capture_output=True, timeout=600)
        # NB: -V 1, not 0 — the reference crashes at verbosity 0 with no
        # filter (dangling `if (verbosity_level >= 1)` swallows the
        # empty-filter-name check, lz_matcher.cpp:31-39)
        cmd = [REF_BIN, "all2all", "--in-dir", VIR61, "--out",
               "/tmp/bench_ref.tsv", "-t", str(threads), "-V", "1"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
        return cmd
    except Exception:
        return None


def hybrid_why(hst: dict) -> str:
    """One-line throttle verdict for a hybrid run's stats dict, so the
    bench artifact explains a zero/low device share instead of leaving it
    ambiguous (VERDICT r3 item 2a)."""
    if not hst:
        return "no stats recorded"
    if hst.get("warm_why"):
        return f"warm-up refused/failed: {hst['warm_why']}"
    if not hst.get("warm_started"):
        return ("lazy-warm gate: projected queue drain below "
                "LZANI_TPU_WARM_MIN_S at the native pool's early rate")
    if hst.get("warm_pending"):
        return "device warm-up did not complete before the queue drained"
    tp = hst.get("tpu_pairs") or 0
    lat = hst.get("duty_latched") or 0
    if tp == 0 and lat:
        return (f"displacement controller latched claims off {lat}x: "
                "device host-side tax (tunnel I/O + replay) displaced "
                "more native throughput than the device added on this "
                "host; on DMA hosts the EMAs agree and claims flow")
    if tp == 0:
        return ("tail-backlog throttle: the native pool was projected to "
                "drain the queue before the device could drain a claimed "
                "group")
    return (f"device contributed {tp} pairs"
            + (f"; duty controller latched {lat}x" if lat else ""))


def time_cmd_best(cmd: list[str], reps: int) -> float:
    dt = 1e9
    for _ in range(reps):  # best-of-N: host noise only ever adds time
        t0 = time.perf_counter()
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
        dt = min(dt, time.perf_counter() - t0)
    return dt


def main() -> int:
    import numpy as np

    p, store = load_vir61()
    codes = store.codes
    n = len(codes)
    pairs = n * (n - 1)
    threads = os.cpu_count() or 1

    # --- reference binary (the baseline being beaten): build + warm now,
    # TIME it interleaved with whichever engines get reported ------------
    ref_cmd = reference_cmd(threads)
    ref_rate = None

    # --- CPU production backend (reference-equivalent) --------------------
    from lzani_tpu.core import native_engine

    p.no_threads = threads
    native_engine.all2all(codes, p)  # warm (.so build, page-in)
    ref_out = native_engine.all2all(codes, p)
    cpu_rate = None

    result = {
        "metric": "vir61_pallas_pairs_per_s",
        "unit": "pairs/s",
        "backend": "pallas-tpu",
        "n_genomes": n,
        "threads": threads,
    }

    # --- TPU event-log engine ---------------------------------------------
    # Probe device discovery in a SUBPROCESS first: a down tunnel makes
    # jax.devices() hang indefinitely in-process (observed: a multi-hour
    # relay outage where backend init neither failed nor returned), and
    # a hung bench is worse than a native-only bench.
    dev_rate = None
    if not os.environ.get("BENCH_SKIP_PALLAS"):
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=240)
            if (probe.returncode != 0
                    or probe.stdout.strip() in ("", "cpu")):
                result["pallas_error"] = (
                    "device probe failed/timed out; native-only bench "
                    f"(rc={probe.returncode})")
                raise RuntimeError("no device")
        except subprocess.TimeoutExpired:
            result["pallas_error"] = ("device discovery hung >240s "
                                      "(tunnel down); native-only bench")
        except RuntimeError:
            pass
    if not os.environ.get("BENCH_SKIP_PALLAS") \
            and "pallas_error" not in result:
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(REPO, ".jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 10.0)
            if jax.default_backend() != "cpu":
                from lzani_tpu.ops.pallas_engine import all2all_pallas

                if os.environ.get("BENCH_PALLAS_FAST"):
                    sub = codes[:12]     # one shape bucket (quick smoke)
                else:
                    sub = codes          # FULL set: the honest headline
                sub_pairs = len(sub) * (len(sub) - 1)
                t0 = time.perf_counter()
                all2all_pallas(sub, p)   # warm: Mosaic compiles
                result["pallas_cold_s"] = round(time.perf_counter() - t0, 1)
                dev_dt = 1e9
                for _ in range(3):  # best-of-3 (tunnel-timing variance
                    # on this host spans ~20% between warm full runs)
                    t0 = time.perf_counter()
                    dev_out = all2all_pallas(sub, p)
                    dev_dt = min(dev_dt, time.perf_counter() - t0)
                exact = np.array_equal(
                    dev_out, ref_out[:len(sub), :len(sub) - 1]
                    if len(sub) < n else ref_out)
                dev_rate = sub_pairs / dev_dt
                result["pallas_n_genomes"] = len(sub)
                result["pallas_exact"] = bool(exact)
                result["pallas_backend"] = jax.default_backend()

                # hybrid (native pool + TPU stealing one row queue) —
                # the executable is already loaded, so this costs only
                # its run time. On wide production hosts this is the
                # recommended backend; on this 4-vCPU bench host the
                # device adds what the throttle lets it claim.
                from lzani_tpu.ops.pallas_engine import all2all_hybrid

                # the reference / native / hybrid ratios are the headline
                # claims, and host load drifts minute-scale (native vir61
                # spanned 2119-3150 pairs/s in one session) — so all
                # THREE run interleaved round-robin, best-of-3 each
                hst = {}
                cpu_dt = hyb_dt = ref_dt = 1e9
                hyb_out = None

                def _ref():
                    nonlocal ref_dt
                    if ref_cmd is not None:
                        ref_dt = min(ref_dt, time_cmd_best(ref_cmd, 1))

                def _nat():
                    nonlocal cpu_dt
                    t0 = time.perf_counter()
                    native_engine.all2all(codes, p)
                    cpu_dt = min(cpu_dt, time.perf_counter() - t0)

                def _hyb():
                    nonlocal hyb_dt, hst, hyb_out
                    rep_st = {}
                    t0 = time.perf_counter()
                    out = all2all_hybrid(codes, p, stats=rep_st)
                    rep_dt = time.perf_counter() - t0
                    if rep_dt < hyb_dt:  # stats travel w/ best rep
                        hyb_dt, hst, hyb_out = rep_dt, rep_st, out

                order = (_ref, _nat, _hyb)
                for rep in range(3):
                    for j in range(3):
                        order[(rep + j) % 3]()
                cpu_rate = pairs / cpu_dt
                if ref_dt < 1e9:
                    ref_rate = pairs / ref_dt
                result["hybrid_pairs_per_s"] = round(pairs / hyb_dt, 1)
                result["hybrid_exact"] = bool(
                    np.array_equal(hyb_out, ref_out))
                result["hybrid_tpu_pairs"] = hst.get("tpu_pairs")
                result["hybrid_why"] = hybrid_why(hst)

                # --- combined-silicon proof: dissimilar-heavy set -----
                # The regime where the device engine is closest to the
                # host pool (desync-dominated). 300 genomes make the run
                # long enough for the hybrid's lazy warm-up to engage;
                # the key records the device's share (tpu_pairs) and the
                # hybrid-vs-native ratio on the SAME workload,
                # interleaved best-of-2 each.
                if not os.environ.get("BENCH_SKIP_DISSIM"):
                    sys.path.insert(0, os.path.join(REPO, "scripts"))
                    import ab_dissimilar as _abd
                    _abd.N = int(os.environ.get("BENCH_DISSIM_N", "500"))
                    dcodes = _abd.synth()
                    dn = len(dcodes)
                    dpairs = dn * (dn - 1)
                    d_ref = native_engine.all2all(dcodes, p)  # warm
                    d_nat_dt = d_hyb_dt = 1e9
                    d_hst = {}
                    d_hyb_out = None
                    # compile + program-load this set's shape buckets
                    # at the SAME batch width the hybrid engine will use
                    # (B = min(64, bucket(n)); an 8-genome warm builds a
                    # B=8 program the 500-genome engine can't reuse —
                    # measured: the in-run warm-up then compiles for
                    # minutes and the device contributes zero pairs).
                    # Primes the process-wide _get_group_step/_run_step_aot
                    # memos, so the timed hybrids' dummy-group warm is
                    # seconds and the device joins early.
                    all2all_pallas(dcodes[:65], p)
                    for _ in range(2):
                        t0 = time.perf_counter()
                        native_engine.all2all(dcodes, p)
                        d_nat_dt = min(d_nat_dt,
                                       time.perf_counter() - t0)
                        rep_st = {}
                        t0 = time.perf_counter()
                        out = all2all_hybrid(dcodes, p, stats=rep_st)
                        rep_dt = time.perf_counter() - t0
                        if rep_dt < d_hyb_dt:
                            d_hyb_dt, d_hst, d_hyb_out = (rep_dt, rep_st,
                                                          out)
                    result["dissim_n_genomes"] = dn
                    result["dissim_native_pairs_per_s"] = round(
                        dpairs / d_nat_dt, 1)
                    result["dissim_hybrid_pairs_per_s"] = round(
                        dpairs / d_hyb_dt, 1)
                    result["dissim_hybrid_tpu_pairs"] = d_hst.get(
                        "tpu_pairs")
                    result["dissim_hybrid_exact"] = bool(
                        np.array_equal(d_hyb_out, d_ref))
                    result["dissim_hybrid_vs_native"] = round(
                        d_nat_dt / d_hyb_dt, 4)
                    result["dissim_hybrid_why"] = hybrid_why(d_hst)

                    # --- combined-silicon MACHINERY proof (greedy) -----
                    # LZANI_TPU_HYBRID_GREEDY bypasses the lazy-warm gate
                    # and every claim throttle, so the device MUST take
                    # rows. This key demonstrates the heterogeneous
                    # scheduler end-to-end (shared queue, device drain,
                    # replay, exactness) even on hosts where the natural
                    # throttles correctly refuse (here: the device's
                    # host-side tunnel tax displaces more native
                    # throughput than its ~700 pairs/s adds against a
                    # ~5.8k pairs/s 4-vCPU pool). NOT a throughput claim.
                    os.environ["LZANI_TPU_HYBRID_GREEDY"] = "1"
                    try:
                        g_st = {}
                        t0 = time.perf_counter()
                        g_out = all2all_hybrid(dcodes, p, stats=g_st)
                        g_dt = time.perf_counter() - t0
                        result["dissim_hybrid_greedy_pairs_per_s"] = round(
                            dpairs / g_dt, 1)
                        result["dissim_hybrid_greedy_tpu_pairs"] = (
                            g_st.get("tpu_pairs"))
                        result["dissim_hybrid_greedy_exact"] = bool(
                            np.array_equal(g_out, d_ref))
                        result["dissim_hybrid_greedy_why"] = hybrid_why(
                            g_st)
                    finally:
                        os.environ.pop("LZANI_TPU_HYBRID_GREEDY", None)

                    # --- spare-host hybrid win (honest throttle) ------
                    # The production host shape: the native pool leaves
                    # the device's host-side work (dispatch prep,
                    # downloads, replay) spare cores — v5e hosts have
                    # ~56 vCPU/chip, so the pool is never the whole
                    # machine. Emulated here by pinning BOTH runs to
                    # half the cores: same pool width, so any hybrid
                    # win is pure device contribution. This is the
                    # honest-throttle combined-silicon artifact (no
                    # greedy override; duty controller live); on the
                    # fully-saturated-host keys above the throttle
                    # correctly refuses instead.
                    import copy as _copy

                    p2 = _copy.copy(p)
                    p2.no_threads = max(1, threads // 2)
                    t0 = time.perf_counter()
                    native_engine.all2all(dcodes, p2)
                    s_nat_dt = time.perf_counter() - t0
                    s_st = {}
                    t0 = time.perf_counter()
                    s_out = all2all_hybrid(dcodes, p2, stats=s_st)
                    s_hyb_dt = time.perf_counter() - t0
                    result["spare_pool_threads"] = p2.no_threads
                    result["spare_native_pairs_per_s"] = round(
                        dpairs / s_nat_dt, 1)
                    result["spare_hybrid_pairs_per_s"] = round(
                        dpairs / s_hyb_dt, 1)
                    result["spare_hybrid_tpu_pairs"] = s_st.get(
                        "tpu_pairs")
                    result["spare_hybrid_vs_native"] = round(
                        s_nat_dt / s_hyb_dt, 4)
                    result["spare_hybrid_exact"] = bool(
                        np.array_equal(s_out, d_ref))
                    result["spare_hybrid_why"] = hybrid_why(s_st)

        except Exception as e:  # report, never fail the bench
            result["pallas_error"] = str(e)[:200]

    if cpu_rate is None or (ref_cmd is not None and ref_rate is None):
        # the device round-robin didn't run (no device / pallas error):
        # measure the baselines now, still interleaved, best-of-2 each
        cpu_dt = ref_dt = 1e9
        for _ in range(2):
            if ref_cmd is not None:
                ref_dt = min(ref_dt, time_cmd_best(ref_cmd, 1))
            t0 = time.perf_counter()
            native_engine.all2all(codes, p)
            cpu_dt = min(cpu_dt, time.perf_counter() - t0)
        cpu_rate = pairs / cpu_dt
        if ref_dt < 1e9:
            ref_rate = pairs / ref_dt

    result["native_pairs_per_s"] = round(cpu_rate, 1)
    result["reference_binary_pairs_per_s"] = (round(ref_rate, 1)
                                              if ref_rate else None)
    baseline = ref_rate or cpu_rate
    if "hybrid_pairs_per_s" in result:
        result["hybrid_vs_baseline"] = round(
            result["hybrid_pairs_per_s"] / baseline, 4)
    if dev_rate is not None:
        result["value"] = round(dev_rate, 1)
        result["vs_baseline"] = round(dev_rate / baseline, 4)
    else:
        # no device attached: report the native engine as the headline
        result["metric"] = "vir61_native_pairs_per_s"
        result["backend"] = "native-cpu"
        result["value"] = round(cpu_rate, 1)
        result["vs_baseline"] = round(cpu_rate / baseline, 4)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
