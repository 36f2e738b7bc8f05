"""Multi-host scaling-efficiency measurement on one machine: N processes
x (cores/N) threads vs 1 process x cores threads over the SAME silicon.
The ratio isolates the cost the multi-host path adds (stride partition,
duplicate ingest, allgather merge, rank-0 store) from compute.

Usage: python scripts/bench_multihost.py [n_genomes] [n_procs]
"""
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500
P = int(sys.argv[2]) if len(sys.argv) > 2 else 2
WORK = "/tmp/mh_bench"

RUNNER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from lzani_tpu.cli import main
raise SystemExit(main(sys.argv[1:]))
"""


def synth():
    rng = np.random.RandomState(21)
    sym = np.frombuffer(b"ACGT", np.uint8)
    os.makedirs(WORK, exist_ok=True)
    fams = max(4, N // 40)
    bases = [rng.randint(0, 4, int(rng.randint(15000, 30000))
                         ).astype(np.uint8) for _ in range(fams)]
    path = os.path.join(WORK, "set.fna")
    with open(path, "wb") as fh:
        for k in range(N):
            c = bases[int(rng.randint(fams))].copy()
            m = rng.rand(len(c)) < rng.uniform(0.01, 0.08)
            c[m] = (c[m] + rng.randint(1, 4, m.sum())) % 4
            fh.write(b">g%05d\n" % k)
            fh.write(sym[c].tobytes())
            fh.write(b"\n")
    return path


def run(procs_env_outs, threads):
    # stderr to files, not PIPEs: ranks block each other at the
    # allgather barrier, and an un-drained pipe that fills would
    # deadlock the whole launch until the timeout
    ps = []
    errs = []
    try:
        for i, (env_extra, out) in enumerate(procs_env_outs):
            env = dict(os.environ)
            env.update(env_extra)
            ef = open(os.path.join(WORK, f"err{i}.log"), "w+")
            errs.append(ef)
            ps.append(subprocess.Popen(
                [sys.executable, "-c", RUNNER, "all2all", "--in-fasta",
                 os.path.join(WORK, "set.fna"), "--out", out, "-t",
                 str(threads), "-V", "0", "--backend", "native"],
                cwd=REPO, env=env, stdout=subprocess.DEVNULL, stderr=ef))
        t0 = time.perf_counter()
        for p, ef in zip(ps, errs):
            p.wait(timeout=3600)
            ef.seek(0)
            assert p.returncode == 0, ef.read()[-1500:]
        return time.perf_counter() - t0
    finally:
        for p in ps:  # never orphan a coordinated peer
            if p.poll() is None:
                p.kill()
        for ef in errs:
            ef.close()


def main():
    synth()
    cores = os.cpu_count() or 4
    pairs = N * (N - 1)

    outs = [os.path.join(WORK, f"mh{i}.tsv") for i in range(P)]
    single = multi = 1e9
    for _ in range(2):  # interleaved best-of-2 (min-of-N or it didn't
        #                 happen; host load drifts minute-scale)
        single = min(single,
                     run([({}, os.path.join(WORK, "single.tsv"))],
                         cores))
        with socket.socket() as s:  # fresh free port per launch
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        envs = [({"JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                  "JAX_NUM_PROCESSES": str(P),
                  "JAX_PROCESS_ID": str(i)}, outs[i]) for i in range(P)]
        multi = min(multi, run(envs, max(1, cores // P)))

    with open(os.path.join(WORK, "single.tsv"), "rb") as a, \
            open(outs[0], "rb") as b:
        same = a.read() == b.read()
    eff = single / multi
    print(f"{N} genomes ({pairs} pairs), {cores} cores: "
          f"1x{cores}t = {single:.1f}s ({pairs/single:.0f} pairs/s), "
          f"{P}x{max(1, cores//P)}t multihost = {multi:.1f}s "
          f"({pairs/multi:.0f} pairs/s), efficiency {eff:.2f}, "
          f"outputs identical: {same}", flush=True)


if __name__ == "__main__":
    main()
