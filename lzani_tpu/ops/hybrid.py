"""Hybrid CPU+TPU all-vs-all scheduler (jax-free at import time).

This module deliberately imports neither jax nor the Pallas engine at
module scope: the CLI's default backend is hybrid, and a run too small
to profit from the device must pay ZERO device cost — including the
~1.4 s `ops.pallas_engine` import (Mosaic/pallas machinery). The engine
is imported lazily inside the warm-up thread, which only starts once
the native pool's early rate projects the queue to outlast
LZANI_TPU_WARM_MIN_S (see `all2all_hybrid`).

Extends the reference's dynamic row scheduling (lz_matcher.cpp:184-270)
across heterogeneous executors; design notes + measurements in
ops/DESIGN.md ("Hybrid CPU+TPU scheduler").
"""

from __future__ import annotations

import numpy as np

# ---- warm-thread lifecycle -------------------------------------------------
# A warm-up thread that is still inside jax import / engine construction /
# a Mosaic compile when the interpreter exits makes glibc abort at teardown
# ("FATAL: exception not rethrown", rc=134) — daemon threads are killed
# mid-C++. The contract: all2all_hybrid sets the cancel flag and does a
# short bounded join; a thread that outlives it is PARKED here and joined
# (unbounded) by an atexit hook, which runs while the interpreter is still
# fully alive. A clean blocking exit always beats an abort; the wait is
# bounded by the warm-up itself, which checks the cancel flag at every
# step boundary.
_parked_warm: list = []
_parked_lock = None
_atexit_registered = False


def _join_parked_warm():
    for t, st in list(_parked_warm):
        st["cancel"] = True
        t.join()
    _parked_warm.clear()


def _park_warm_thread(t, warm_state):
    global _parked_lock, _atexit_registered
    import atexit
    import threading

    if _parked_lock is None:
        _parked_lock = threading.Lock()
    with _parked_lock:
        # drop entries that have since finished
        _parked_warm[:] = [(pt, ps) for pt, ps in _parked_warm
                           if pt.is_alive()]
        _parked_warm.append((t, warm_state))
        if not _atexit_registered:
            atexit.register(_join_parked_warm)
            _atexit_registered = True


def _thread_idle_priority():
    """Best-effort: drop the CALLING thread's scheduling priority to idle
    (Linux per-thread nice 19). The hybrid scheduler runs ALL device-side
    host work this way — warm-up, dispatch, downloads, replay — so it can
    only consume cycles the native pool leaves spare (measured: a warm-up
    that never finished displaced 19% of native throughput at normal
    priority). Returns (tid, old_nice) for _restore_priority, or None."""
    try:
        import ctypes
        import platform

        nr = {"x86_64": 186, "aarch64": 178}.get(platform.machine())
        if nr is None:
            return None
        libc = ctypes.CDLL(None, use_errno=True)
        tid = libc.syscall(nr)
        if tid <= 0:
            return None
        old = libc.getpriority(0, tid)
        libc.setpriority(0, tid, 19)
        return (tid, old)
    except Exception:
        return None


def _restore_priority(tok):
    if tok is None:
        return
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        libc.setpriority(0, tok[0], tok[1])
    except Exception:
        pass


def _make_finalize(codes, params, out, rf, rf_lock):
    """Shared per-pair finalizer: replay the device event log through the
    native emission machinery (exact stats + regions), falling back to a
    full native parse when the log is absent/invalid. Appends region
    records (with the reference pre-filter, lz_matcher.cpp:115-138) to rf
    under rf_lock. Thread-safe; used by both the pure-device and the
    hybrid drivers."""
    from ..core import native_engine

    flt = params.output_filter
    f_gani = flt.get("gani", 0.0)
    f_ani = flt.get("ani", 0.0)
    f_qcov = flt.get("qcov", 0.0)
    want_regions = rf is not None

    def finalize(r, q, ev, slot):
        if ev is not None:
            try:
                stats, regs = native_engine.replay_events(
                    codes[r], codes[q], params, ev,
                    want_regions=want_regions)
            except ValueError:
                stats, regs = native_engine.parse_pair(
                    codes[r], codes[q], params, want_regions=want_regions)
        else:
            stats, regs = native_engine.parse_pair(
                codes[r], codes[q], params, want_regions=want_regions)
        out[slot] = stats
        if rf is not None:
            m = int(regs[:, 4].sum()) if len(regs) else 0
            l = int(regs[:, 5].sum()) if len(regs) else 0
            q_len = len(codes[q])
            gani = m / q_len
            ani = m / (m + l) if (m + l) else 0.0
            qcov = (m + l) / q_len
            if not flt or (gani >= f_gani and ani >= f_ani
                           and qcov >= f_qcov):
                rec = np.concatenate(
                    [np.array([r, q, len(regs)], np.int32),
                     np.asarray(regs, np.int32).reshape(-1)])
                with rf_lock:
                    rec.tofile(rf)

    return finalize



def all2all_hybrid(codes, params, filter_csr=None, progress=None,
                   region_path: str | None = None, devices=None,
                   interpret: bool = False, cpu_threads: int | None = None,
                   replay_threads: int = 0, stats: dict | None = None):
    """Heterogeneous all-vs-all: the native C++ thread pool AND the TPU
    event-log engine pop reference rows from ONE shared two-ended atomic
    queue, writing into one shared triples buffer. This extends the
    reference's dynamic row scheduling (lz_matcher.cpp:184-270) across
    every piece of silicon on the host — on a production TPU VM
    (hundreds of vCPUs + chips) total throughput is the sum of both
    engines.

    Scheduling (all three points measured on this host):
      * Two-ended queue (lza_claim_head / lza_claim_tail): the CPU pool
        keeps the reference's longest-first schedule from the head; the
        device — ~10x slower per pair here — claims the SHORT cheap
        rows from the tail, so it can never capture an expensive head
        row and become the critical path.
      * Tail throttle: the device claims GROUP rows at a time and only
        while the CPU pool would not finish the remaining queue before
        the device could drain its own backlog (EMA of drain-to-drain
        intervals), so hybrid never trails native alone by more than
        one in-flight group.
      * Lazy asynchronous warm-up: a program's first execution in a
        process costs ~80-275 s through this tunnel, and even the
        engine construction packs + uploads on host CPU the native
        pool could use (measured -7% on vir61). Warm-up starts only
        once the native pool's early rate projects the queue to
        outlast LZANI_TPU_WARM_MIN_S (default 20 s); the device joins
        the queue only once a dummy-group dispatch completes; and the
        run returns as soon as the queue drains — a slow warm-up never
        gates completion (stats['warm_pending'] reports it).

    Failures migrate, not lose, work: a device dead at warm-up degrades
    the run to pure-native; a device dying mid-run has its
    claimed-but-unfinalized rows re-run on the host.

    cpu_threads=0 degrades to all2all_pallas; no usable device degrades
    to the native engine.
    """
    import copy
    import ctypes as ct
    import os
    import threading
    import time
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from ..core import native_engine

    n = len(codes)
    if cpu_threads is None:
        # honor the caller's -t (params.no_threads); when unset (0),
        # the full pool: the driver's own threads are tunnel-bound
        # (mostly idle) and the replay cost of device-claimed pairs is
        # well under a core — oversubscription beats reserving one
        cpu_threads = (getattr(params, "no_threads", 0)
                       or os.cpu_count() or 1)
    if cpu_threads <= 0:
        from .pallas_engine import all2all_pallas
        return all2all_pallas(codes, params, filter_csr=filter_csr,
                              progress=progress, region_path=region_path,
                              devices=devices, interpret=interpret,
                              replay_threads=replay_threads)
    if devices is not None and (
            not devices or (not interpret
                            and devices[0].platform not in ("tpu",))):
        return native_engine.all2all(codes, params, filter_csr=filter_csr,
                                     region_path=region_path)
    # devices=None is resolved INSIDE the warm thread: on this backend
    # first device discovery costs seconds (axon init), which must not
    # gate the native pool start (and is never paid on runs too small
    # for the device to profit)

    if filter_csr is None:
        indptr = ids = None
        out = np.zeros((n, max(n - 1, 0), 3), dtype=np.int32)
        total_pairs = n * (n - 1)
    else:
        indptr, ids = filter_csr
        out = np.zeros((len(ids), 3), dtype=np.int32)
        total_pairs = len(ids)

    lib = native_engine.get_lib()
    # two-ended row queue packed as {tail:32|head:32}
    counter = np.array([n << 32], np.int64)
    cptr = counter.ctypes.data_as(ct.POINTER(ct.c_int64))

    def queue_rem():
        v = int(counter[0])
        return (v >> 32) - (v & 0xFFFFFFFF)

    rf = open(region_path + ".tpu", "wb") if region_path else None
    rf_lock = threading.Lock()
    finalize = _make_finalize(codes, params, out, rf, rf_lock)

    # ---- CPU side: the native pool claims rows from the shared queue ----
    p2 = copy.copy(params)
    p2.no_threads = cpu_threads
    nat_prog = np.zeros(2, np.int64)
    nat_exc: list[BaseException] = []

    def run_native():
        try:
            native_engine.all2all(codes, p2, filter_csr=filter_csr,
                                  region_path=region_path,
                                  progress=nat_prog,
                                  ext_counter=counter, out=out)
        except BaseException as e:  # surfaced after join
            nat_exc.append(e)

    # ---- device side ----------------------------------------------------
    # NB: engine construction (query-matrix packing + upload) happens in
    # the warm thread, off the run's critical path — built here it
    # measurably depressed the native pool while the device could not
    # contribute yet
    eng = None
    GROUP = max(1, int(os.environ.get("LZANI_TPU_GROUP", "4")))
    depth = 2  # refined to 2*len(devices) once the warm thread resolves
    mrd = params.max_dist_in_ref

    _seq_len = getattr(codes, "seq_len", None) or (lambda r: len(codes[r]))

    def fits(r):
        # fits() is only reached after warm-up succeeds, so the engine
        # module is already in sys.modules — this import is a dict hit
        from .pallas_engine import PallasAll2All
        return 2 * _seq_len(r) + 3 * mrd <= PallasAll2All.MAX_REF_SYMS

    def wanted_of(r):
        if filter_csr is None:
            return {q: None for q in range(n) if q != r}
        return {int(q): int(indptr[r]) + k
                for k, q in enumerate(ids[indptr[r]:indptr[r + 1]])}

    tpu_pairs = 0       # drained (event logs downloaded)
    tpu_claimed = 0     # pairs on claimed device rows
    tpu_done = [0]      # fully finalized (replayed + stored)
    tpu_rows = [0]      # reference rows fully drained on the device side
    tpu_lock = threading.Lock()

    def fin_track(r, q, ev, slot):
        finalize(r, q, ev, slot)
        with tpu_lock:
            tpu_done[0] += 1

    def native_row_track(*a):
        # oversized/recovered rows run host-side but were claimed by the
        # device scheduler — count them for Sequences% when done
        _native_row(*a)
        with tpu_lock:
            tpu_rows[0] += 1
        report()

    def report():
        if progress is not None:
            progress(int(nat_prog[1]) + tpu_pairs, total_pairs,
                     int(nat_prog[0]) + tpu_rows[0], n)

    nat_thread = threading.Thread(target=run_native, daemon=True)
    t_run0 = time.perf_counter()
    nat_thread.start()

    nthreads = replay_threads or max(2, (os.cpu_count() or 2) - 1)
    # every device-side host thread runs at idle priority: the device
    # path may only consume cycles the native pool leaves spare
    dl_pool = ThreadPoolExecutor(max_workers=2,
                                 initializer=_thread_idle_priority)
    pool = ThreadPoolExecutor(max_workers=nthreads,
                              initializer=_thread_idle_priority)
    pending = []
    drain_futs = []
    inflight = deque()   # (r_list, subs_by_lo, handles, t_dispatch)
    unit_q = deque()     # (r_list, lo, subs, idx_future, device)
    # steady-state device unit service time: EMA of drain-to-drain
    # intervals (pipeline-aware, unlike per-dispatch wall time)
    t_group = [None]
    t_last_drain = [None]

    verbosity = getattr(params, "verbosity_level", 1)

    def _warn(msg):
        if verbosity >= 1:
            import sys
            print(msg, file=sys.stderr)

    # construct the engine and warm the run-wide executable on an
    # all-dummy group before claiming (the first execution in a process
    # pays the program load, and rows claimed before warm-up would
    # starve the faster CPU pool) — ASYNCHRONOUSLY: a cold compile/load
    # must never gate a run the CPU pool can finish by itself — and
    # LAZILY: warm-up itself (engine construction packs + uploads on the
    # host) costs CPU the native pool could use (measured -7% on vir61),
    # so it only starts once the native pool's own early rate projects
    # the remaining queue to outlast LZANI_TPU_WARM_MIN_S seconds
    warm_state: dict = {"s": None, "ok": None, "why": None}

    def _dbg(msg):
        if debug:
            import sys as _s
            print(f"[hyb +{time.perf_counter() - t_run0:6.1f}s] {msg}",
                  file=_s.stderr, flush=True)

    def _warm():
        nonlocal eng, devices, depth
        _dbg("warm thread entered")
        if not greedy and warm_state.get("projected_s", 0.0) < 60.0:
            # Short queue: the warm-up may only consume cycles the
            # native pool leaves spare — at idle priority a saturated
            # 4-vCPU pool starves it and the run correctly finishes
            # native-only. LONG queue (>= 60 s projected): warm at
            # normal priority — the seconds of engine construction
            # displace < ~1% of a minutes-long run, while an
            # idle-priority warm measurably never finishes at all
            # (r4 bench and the r5 N=1000 probe: cancelled-before-
            # dispatch after 170 s). Greedy mode always keeps normal
            # priority (machinery demonstration).
            _thread_idle_priority()
        try:
            # the jax + pallas_engine imports (~1.4 s of Mosaic/pallas
            # machinery) are part of the warm-up cost by design: a run
            # that never warms never pays them
            import jax

            if warm_state.get("cancel"):  # run drained during the import
                warm_state["ok"] = False
                warm_state["why"] = "cancelled-after-import"
                return

            from .pallas_engine import PallasAll2All
            from .pallas_engine import device_envelope_reason
            env_why = device_envelope_reason(params)
            if env_why is not None:
                # out-of-envelope parameter sets run pure-native
                # (policy, not a failure — all2all_pallas would only
                # delegate back to the native engine anyway)
                warm_state["ok"] = False
                warm_state["why"] = f"envelope: {env_why}"
                return
            with jax.enable_x64(False):
                if devices is None:
                    devices = jax.local_devices()[:1]
                    if not devices or (not interpret
                                       and devices[0].platform != "tpu"):
                        # no usable accelerator: the native pool simply
                        # owns the run (policy, not a failure — no warning)
                        warm_state["ok"] = False
                        warm_state["why"] = "no-device"
                        return
                if warm_state.get("cancel"):  # run already drained
                    warm_state["ok"] = False
                    warm_state["why"] = "cancelled-before-engine"
                    return
                if not greedy:
                    # re-project before the expensive construction (pack
                    # + upload): the gate's projection used the pool's
                    # EARLY rate, which understates the steady rate on
                    # fast regimes — measured: a clustered mix that
                    # drained in 26 s projected > 60 s at gate time and
                    # the normal-priority construction cost the run 9 s.
                    # By now the rate estimate spans the import seconds;
                    # if the queue no longer outlasts the threshold,
                    # demote to idle so construction only rides spare
                    # cycles (it will then usually be cancelled, which
                    # is the correct outcome for a short queue).
                    el = time.perf_counter() - t_run0
                    pdone = int(nat_prog[1])
                    if pdone > 0 and el > 0:
                        rem_s = (total_pairs - pdone) / (pdone / el)
                        if rem_s < 60.0:
                            _thread_idle_priority()
                depth = 2 * len(devices)
                _dbg("warm: devices resolved")
                eng = PallasAll2All(codes, params, devices=devices,
                                    interpret=interpret)
                _dbg("warm: engine constructed")
                if warm_state.get("cancel"):
                    warm_state["ok"] = False
                    warm_state["why"] = "cancelled-before-dispatch"
                    return
                gi = eng.build_group_index([-1] * GROUP, eng.devices[0])
                t0 = time.perf_counter()
                eng.collect_group(eng.dispatch_group(gi, 0,
                                                     eng.devices[0]))
                warm_state["s"] = time.perf_counter() - t0
                warm_state["ok"] = True
                _dbg(f"warm: dummy dispatch done ({warm_state['s']:.1f}s)")
        except Exception as e:  # device dead at startup: CPU owns the run
            warm_state["ok"] = False
            warm_state["why"] = f"{type(e).__name__}: {e}"[:200]
            _warn(f"lz-ani-tpu: device warm-up failed "
                  f"({type(e).__name__}: {e}); hybrid run continues on "
                  f"the native pool alone")

    warm_min_s = float(os.environ.get("LZANI_TPU_WARM_MIN_S", "20"))
    warm_thread = threading.Thread(target=_warm, daemon=True)

    def drain(r_list, subs, handles, t_disp, urem=None, nrows=0):
        nonlocal tpu_pairs
        evs = eng.collect_group(handles)
        lo = subs[1]
        n_sub = 0

        def fin_many(r, items):
            # one replay task per reference row (per-pair futures are
            # pure submission overhead; see all2all_pallas.drain)
            for q, ev, slot in items:
                fin_track(r, q, ev, slot)

        for g, r in enumerate(r_list):
            items = []
            for q, w in subs[0][g].items():
                slot = ((r, q - 1 if q > r else q)
                        if filter_csr is None else w)
                items.append((q, evs[g][q - lo], slot))
                n_sub += 1
            if items:
                pending.append(pool.submit(fin_many, r, items))
        with tpu_lock:
            tpu_pairs += n_sub
            if urem is not None:
                urem[0] -= 1
                if urem[0] == 0:   # group's last unit: its rows are done
                    tpu_rows[0] += nrows
            now = time.perf_counter()
            if t_last_drain[0] is not None:
                dt = now - t_last_drain[0]
                t_group[0] = (dt if t_group[0] is None
                              else 0.5 * t_group[0] + 0.5 * dt)
            t_last_drain[0] = now
        report()

    greedy = bool(int(os.environ.get("LZANI_TPU_HYBRID_GREEDY", "0")))
    debug = bool(int(os.environ.get("LZANI_TPU_HYBRID_DEBUG", "0")))

    grp_pairs_est = max(1, GROUP * total_pairs // max(1, n))

    # ---- duty-cycle displacement controller --------------------------------
    # The device's host-side tax (tunnel I/O, replay, index builds)
    # competes with the native pool for cores; on a narrow host it can
    # displace more native throughput than the device adds. A baseline
    # measured at run start CANNOT detect this: the longest-first
    # schedule makes the native rate RISE over the run, masking any sag
    # (measured: 52k device pairs and still 0.94x end-to-end). Sound
    # control = A/B in time: claims are duty-cycled (ACT s on, PAUSE s
    # off), each ~1 s bucket of native progress is classified by whether
    # the device pipeline was active, and adjacent active/idle rate EMAs
    # are compared. If active < RATIO * idle, claims latch off (and
    # re-probe once per RETRY s — the workload mix may change). On DMA
    # hosts the tax ~vanishes, the EMAs agree, and claims flow.
    ACT, PAUSE, BUCKET = 6.0, 1.5, 0.8
    RATIO, RETRY = 0.985, 45.0
    duty = {"b0": None, "p0": 0, "act": False,   # current bucket
            "ema_a": None, "ema_i": None, "n_a": 0, "n_i": 0,
            "off_until": 0.0, "latched": 0}

    def device_active():
        return (len(inflight) + len(unit_q) > 0
                or tpu_claimed - tpu_done[0] > 0)

    def duty_sample(el):
        """Advance the bucket clock; returns True while claims are
        allowed by the duty/latch state."""
        d = duty
        if d["b0"] is None:
            d["b0"], d["p0"] = el, int(nat_prog[1])
            d["act"] = device_active()
            return True
        d["act"] = d["act"] or device_active()
        span = el - d["b0"]
        if span >= BUCKET and nat_thread.is_alive():
            rate = (int(nat_prog[1]) - d["p0"]) / span
            k = "ema_a" if d["act"] else "ema_i"
            nk = "n_a" if d["act"] else "n_i"
            d[k] = rate if d[k] is None else 0.6 * d[k] + 0.4 * rate
            d[nk] += 1
            d["b0"], d["p0"] = el, int(nat_prog[1])
            d["act"] = device_active()
            if (d["n_a"] >= 2 and d["n_i"] >= 2
                    and d["ema_a"] < RATIO * d["ema_i"]):
                d["off_until"] = el + RETRY
                d["latched"] += 1
                # forget the verdict inputs so the re-probe is fresh
                d["ema_a"] = d["ema_i"] = None
                d["n_a"] = d["n_i"] = 0
                if debug:
                    print(f"[hybrid] displacement latch at el={el:.1f} "
                          f"(active<{RATIO}*idle)", flush=True)
        if el < d["off_until"]:
            return False
        # duty cycle guarantees idle buckets exist for the comparison
        return ((el - d["off_until"]) % (ACT + PAUSE)) < ACT

    def claim_rows():
        """Claim up to GROUP rows from the tail (shortest refs) — but
        only while the device demonstrably ADDS throughput. Three gates,
        each added for a measured failure mode on this host:
        (1) the duty-cycle displacement controller above;
        (2) one probe group until the first drain establishes the
            device's service time (a cold burst of depth+1 groups made
            the device the critical path on small sets);
        (3) tail backlog: never claim what the CPU pool would finish
            before the device could drain its own queue. Plus an
            outstanding-pairs cap: the host-side tax is DEFERRED through
            queues, and drain-time feedback alone let debt build
            invisibly and materialize at the end-of-run barrier
            (measured: -42% on a 300-genome set)."""
        rem = queue_rem()
        if rem <= 0:
            return None
        el = time.perf_counter() - t_run0
        rows_done = int(nat_prog[0])
        if not greedy:
            allow = duty_sample(el)
            if tpu_claimed - tpu_done[0] > 2 * grp_pairs_est:
                return None
            if not allow:
                return None
            if t_group[0] is None and (len(inflight) + len(unit_q)) >= 1:
                return None
            if rows_done > 0 and el > 0:
                cpu_rate = rows_done / el
                # a real group costs ~2.5-4x the all-dummy warm dispatch
                tg = (t_group[0] if t_group[0] is not None
                      else 4.0 * (warm_state["s"] or 1.0))
                backlog = (len(inflight) + len(unit_q) + 1) * tg
                if rem / cpu_rate < backlog:
                    return None
        got = ct.c_int64(0)
        start = int(lib.lza_claim_tail(cptr, GROUP, ct.byref(got)))
        if start < 0:
            return None
        return list(range(start, start + int(got.value)))

    k_disp = 0
    done_claiming = False
    current = None  # unit popped but not yet in `inflight` (salvage set)
    warm_started = False
    # the scheduler loop itself (index builds, dispatch prep) is device-
    # side host work too — idle priority, restored before returning
    # (greedy keeps normal priority: see _warm)
    prio_tok = None if greedy else _thread_idle_priority()
    try:
        while True:
            if not warm_started:
                # lazy warm-up gate: join only if the queue will outlast
                # the threshold at the native pool's own early rate (the
                # projection can only shrink, so one decision suffices)
                if queue_rem() <= 0 or not nat_thread.is_alive():
                    break
                el = time.perf_counter() - t_run0
                pdone = int(nat_prog[1])
                if greedy:
                    warm_started = True
                elif el >= 0.5 and pdone > 0:
                    projected = (total_pairs - pdone) / (pdone / el)
                    if projected <= warm_min_s:
                        break  # run too small to profit from the device
                    warm_state["projected_s"] = projected
                    warm_started = True
                if warm_started:
                    warm_thread.start()
                else:
                    time.sleep(0.02)
                    continue
            if warm_state["ok"] is None:
                # device still warming: the CPU owns the queue meanwhile,
                # and if it drains everything the run ends WITHOUT
                # waiting for the warm-up
                if queue_rem() <= 0:
                    break
                time.sleep(0.05)
                continue
            if warm_state["ok"] is False:
                break
            while not done_claiming and len(unit_q) < depth + 1:
                rows = claim_rows()
                if rows is None:
                    # a None from the tail throttle is not final — the
                    # CPU may stall (or the estimate may change); only an
                    # exhausted counter ends claiming for good
                    if queue_rem() <= 0:
                        done_claiming = True
                    break
                dev_rows = [r for r in rows if fits(r)]
                big = [r for r in rows if not fits(r)]
                for r in big:
                    # oversized reference: run its whole row through a
                    # single-threaded native call (one index build)
                    pending.append(pool.submit(native_row_track, codes, params,
                                               r, wanted_of(r), out,
                                               filter_csr is None,
                                               region_path, rf, rf_lock))
                if not dev_rows:
                    continue
                r_list = list(dev_rows)
                while len(r_list) < GROUP:
                    r_list.append(-1)
                dev = eng.device_for(k_disp)
                gf = pool.submit(eng.build_group_index, r_list, dev)
                wanteds = [wanted_of(r) if r >= 0 else {} for r in r_list]
                tpu_claimed += sum(len(w) for w in wanteds)
                g_units = []
                for lo in range(0, eng.n_pad, eng.B):
                    subs = [{q: w for q, w in wanted.items()
                             if lo <= q < lo + eng.B} for wanted in wanteds]
                    if any(subs):
                        g_units.append((lo, subs))
                urem = [len(g_units)]   # Sequences%: rows count at the
                nrows = len(dev_rows)   # group's last drain
                for lo, subs in g_units:
                    unit_q.append((r_list, lo, subs, gf, dev, urem, nrows))
            if not unit_q and not inflight:
                if done_claiming:
                    break
                # throttled: the CPU owns the rest; wait for it
                if not nat_thread.is_alive():
                    done_claiming = queue_rem() <= 0
                    if done_claiming:
                        break
                time.sleep(0.02)
                continue
            if unit_q:
                current = unit_q.popleft()
                r_list, lo, subs, gf, dev, urem, nrows = current
                idx = gf.result()
                t_disp = time.perf_counter()
                handles = eng.dispatch_group(idx, lo, dev)
                inflight.append((r_list, (subs, lo), handles, t_disp,
                                 urem, nrows))
                current = None
                k_disp += 1
            if len(inflight) >= depth or not unit_q:
                if inflight:
                    u = inflight.popleft()
                    drain_futs.append(
                        (dl_pool.submit(drain, *u), u[0]))

        failed_rows: set[int] = set()
        for f, rl in drain_futs:
            try:
                f.result()
            except Exception as e:
                _warn(f"lz-ani-tpu: device drain failed "
                      f"({type(e).__name__}: {e}); group recovered on "
                      f"the host")
                failed_rows.update(r for r in rl if r >= 0)
    except Exception as e:
        # device failure mid-run: every claimed-but-unfinalized row is
        # re-run on the host (finalize writes are idempotent, so a group
        # that partially drained is safe to redo whole)
        failed_rows = set()
        if current is not None:
            failed_rows.update(r for r in current[0] if r >= 0)
        for u in unit_q:
            failed_rows.update(r for r in u[0] if r >= 0)
        for u in inflight:
            failed_rows.update(r for r in u[0] if r >= 0)
        for f, rl in drain_futs:
            try:
                f.result()
            except Exception:
                failed_rows.update(r for r in rl if r >= 0)
        _warn(f"lz-ani-tpu: device failed mid-run ({type(e).__name__}: "
              f"{e}); {len(failed_rows)} claimed rows recovered on the "
              f"host, run continues on the native pool")
    for r in sorted(failed_rows):
        pending.append(pool.submit(native_row_track, codes, params, r,
                                   wanted_of(r), out, filter_csr is None,
                                   region_path, rf, rf_lock))
    warm_state["cancel"] = True  # a still-pending warm-up stops at its
    #                              next step boundary
    if warm_started and warm_thread.is_alive():
        # bounded join: the common case is cancel landing at the next
        # step boundary within this window. A thread stuck deeper (jax
        # import, engine construction, Mosaic compile — uninterruptible)
        # is parked for an unbounded atexit join so interpreter teardown
        # never kills it mid-C++ (the rc=134 "exception not rethrown"
        # abort).
        warm_thread.join(timeout=2.0)
        if warm_thread.is_alive():
            _park_warm_thread(warm_thread, warm_state)
    nat_thread.join()
    _restore_priority(prio_tok)
    if nat_exc:
        raise nat_exc[0]
    for f in pending:
        f.result()
    pool.shutdown(wait=True)
    dl_pool.shutdown(wait=True)
    report()
    if stats is not None:
        stats["tpu_pairs"] = tpu_pairs
        stats["cpu_rows"] = int(nat_prog[0])
        stats["cpu_pairs"] = int(nat_prog[1])
        stats["warm_s"] = warm_state["s"]
        stats["warm_started"] = warm_started
        stats["warm_pending"] = warm_started and warm_state["ok"] is None
        stats["warm_why"] = warm_state.get("why")
        stats["t_unit_s"] = t_group[0]
        stats["duty_latched"] = duty["latched"]
    if rf is not None:
        rf.close()
        # merge the device side's region records into the native file
        # (records are self-delimiting and order-independent)
        with open(region_path, "ab") as dst, \
                open(region_path + ".tpu", "rb") as src:
            while True:
                chunk = src.read(1 << 20)
                if not chunk:
                    break
                dst.write(chunk)
        os.remove(region_path + ".tpu")
    return out



def _native_row(codes, params, r, wanted, out, dense, region_path,
                rf, rf_lock):
    """Hybrid helper: run one oversized reference row through the native
    engine (single worker, one index build) into the shared buffer."""
    from ..core import native_engine

    n = len(codes)
    qs = sorted(wanted.keys())
    indptr = np.zeros(n + 1, np.int64)
    indptr[r + 1:] = len(qs)
    csr = (indptr, np.array(qs, np.int32))
    import copy
    p1 = copy.copy(params)
    p1.no_threads = 1
    sub = native_engine.all2all(codes, p1, filter_csr=csr)
    for k, q in enumerate(qs):
        slot = (r, q - 1 if q > r else q) if dense else wanted[q]
        out[slot] = sub[k]
    if rf is not None:
        # regions for the row via per-pair native parses (rare path)
        fin = _make_finalize(codes, params,
                             np.zeros((n, max(n - 1, 0), 3), np.int32)
                             if dense else np.zeros((len(qs), 3), np.int32),
                             rf, rf_lock)
        for k, q in enumerate(qs):
            fin(r, q, None, (r, q - 1 if q > r else q) if dense else k)

