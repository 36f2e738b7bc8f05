"""Bisect TPU worker crash: run the parse at increasing sizes."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from lzani_tpu.params import Params
from lzani_tpu.ops.engine_jax import RefIndexJax
from lzani_tpu.core import native_engine

p = Params()
rng = np.random.RandomState(0)

for L in [200, 1000, 4000, 16000, 42000]:
    ref = rng.randint(0, 4, L).astype(np.uint8)
    q = ref.copy()
    q[:: 13] = (q[:: 13] + 1) % 4
    q2 = rng.randint(0, 4, L).astype(np.uint8)  # unrelated: literal-heavy
    t0 = time.perf_counter()
    idx = RefIndexJax(ref, p)
    jax.block_until_ready(idx.tab)
    t1 = time.perf_counter()
    out = idx.parse_batch([q, q2], p)
    stats = np.asarray(out)
    t2 = time.perf_counter()
    nat0, _ = native_engine.parse_pair(ref, q, p)
    nat1, _ = native_engine.parse_pair(ref, q2, p)
    ok = (tuple(stats[0]) == nat0) and (tuple(stats[1]) == nat1)
    print(f"L={L}: idx {t1-t0:.1f}s parse {t2-t1:.1f}s ok={ok} "
          f"sim={stats[0].tolist()} rand={stats[1].tolist()}", flush=True)
    # warm rerun
    t0 = time.perf_counter()
    jax.block_until_ready(idx.parse_batch([q, q2], p))
    print(f"  warm: {time.perf_counter()-t0:.3f}s", flush=True)
