"""REAL multi-process validation of the multi-host path: two OS processes
rendezvous through jax.distributed (127.0.0.1 coordinator), each computes
its stride-partition share of an all2all via the production event-log
engine (interpret, CPU), and the parent merges and checks against the
native oracle. Upgrades tests/test_distributed.py's simulated-host dryrun
to an actual jax.distributed runtime exercise (SURVEY §7 L4).

Usage: python scripts/test_multihost_real.py
"""
import os
import pickle
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, pickle, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from lzani_tpu.params import Params
from lzani_tpu.parallel.distributed import all2all_multihost, init_distributed

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); out = sys.argv[3]
got = init_distributed(coordinator_address="127.0.0.1:%(port)d",
                       num_processes=nproc, process_id=pid)
assert got == (pid, nproc), got

rng = np.random.RandomState(17)
base = rng.randint(0, 4, 420).astype(np.uint8)
codes = []
for i in range(5):
    s = base.copy()
    s[:: (i + 4)] = (s[:: (i + 4)] + 1) %% 4
    codes.append(s[: 420 - 13 * i])
p = Params()
slots, triples, total = all2all_multihost(
    codes, p, interpret=True, process_id=pid, num_processes=nproc)
with open(out, "wb") as fh:
    pickle.dump((slots, np.asarray(triples), total), fh)
print("worker", pid, "done", len(slots), flush=True)
"""


def main():
    port = 45617
    src = WORKER % {"repo": REPO, "port": port}
    with tempfile.TemporaryDirectory() as td:
        wpath = os.path.join(td, "worker.py")
        with open(wpath, "w") as fh:
            fh.write(src)
        env = dict(os.environ)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        procs = []
        outs = []
        for pid in range(2):
            out = os.path.join(td, f"out{pid}.pkl")
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, wpath, str(pid), "2", out], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        for pr in procs:
            txt, _ = pr.communicate(timeout=600)
            if pr.returncode != 0:
                print(txt.decode()[-2000:])
                print("FAIL: worker exited", pr.returncode)
                return 1

        import numpy as np
        sys.path.insert(0, REPO)
        import jax
        jax.config.update("jax_platforms", "cpu")
        from lzani_tpu.core import native_engine as ne
        from lzani_tpu.parallel.distributed import merge_host_triples
        from lzani_tpu.params import Params

        per_host = []
        total = None
        for out in outs:
            with open(out, "rb") as fh:
                slots, triples, total = pickle.load(fh)
            per_host.append((slots, triples))
        merged = merge_host_triples(total, per_host)

        rng = np.random.RandomState(17)
        base = rng.randint(0, 4, 420).astype(np.uint8)
        codes = []
        for i in range(5):
            s = base.copy()
            s[:: (i + 4)] = (s[:: (i + 4)] + 1) % 4
            codes.append(s[: 420 - 13 * i])
        want = ne.all2all(codes, Params()).reshape(-1, 3)
        ok = np.array_equal(merged, want)
        print("2-process jax.distributed all2all:",
              "EXACT" if ok else "MISMATCH")
        return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
