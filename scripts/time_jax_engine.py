"""Ad-hoc: verify the device engine against the oracle and time warm parses."""
import glob
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from lzani_tpu.params import Params
from lzani_tpu.io.fasta import load_store
from lzani_tpu.ops.engine_jax import RefIndexJax
from lzani_tpu.core import native_engine

p = Params()
p.input_file_names = sorted(glob.glob("/root/reference/test/vir61/*.fna"))
store = load_store(p)
store.reorder()
codes = store.codes

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
t0 = time.perf_counter()
idx = RefIndexJax(codes[30], p)
jax.block_until_ready(idx.tab)
print(f"index build+compile: {time.perf_counter()-t0:.1f}s", flush=True)

qs = [codes[i] for i in range(B)]
t0 = time.perf_counter()
out = idx.parse_batch(qs, p)
stats = np.asarray(out)
print(f"parse B={B} (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)

for i in range(4):
    nat, _ = native_engine.parse_pair(codes[30], codes[i], p)
    ok = tuple(int(x) for x in stats[i]) == nat
    print(f"pair {i}: jax={stats[i].tolist()} native={list(nat)} ok={ok}",
          flush=True)

for rep in range(3):
    t0 = time.perf_counter()
    out = idx.parse_batch(qs, p)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"warm rep {rep}: {dt*1000:.1f}ms -> {B/dt:.1f} pairs/s", flush=True)
