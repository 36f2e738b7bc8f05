"""Isolate Pallas loop overhead: pure scalar loop vs VMEM-scalar-read loop
vs modulo cost. Timing via forced host transfer."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = int(__import__("os").environ.get("STEPS", 20000))
L = 1 << 16


def make(variant):
    def kernel(ref_ref, s_ref, out_ref):
        def body(t, st):
            i, acc = st
            if variant == "scalar":
                acc = acc + i * 3 + 1
                i = i + 1
            elif variant == "scalar_mod":
                acc = acc + i * 3 + 1
                i = (i + 7) % 12345
            elif variant == "smem_read":
                acc = acc + s_ref[0]
                i = i + 1
            elif variant == "vmem_scalar":
                acc = acc + ref_ref[0, pl.ds((i * 7) % 12345, 1)][0]
                i = i + 1
            elif variant == "vmem_vec":
                blk = ref_ref[0:1, pl.ds(((i * 7) % 512) * 128, 128)]
                acc = acc + jnp.sum(blk)
                i = i + 1
            return i, acc

        _, acc = jax.lax.fori_loop(0, STEPS, body, (0, jnp.int32(0)))
        out_ref[0, 0] = acc

    @jax.jit
    def run(ref, s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(ref, s)

    return run


ref = jnp.asarray(np.random.randint(0, 4, (1, L)).astype(np.int32))
for variant in (sys.argv[1:] or ["scalar"]):
    run = make(variant)
    s = jnp.asarray(np.random.randint(1, 5, (8,)).astype(np.int32))
    _ = int(run(ref, s)[0, 0])
    ts = []
    for _ in range(3):
        s2 = jnp.asarray(np.random.randint(1, 5, (8,)).astype(np.int32))
        t0 = time.perf_counter()
        v = int(run(ref, s2)[0, 0])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{variant:12s}: {dt*1e3:8.2f}ms -> {dt/STEPS*1e6:7.4f}us/step",
          flush=True)
