"""Decompose Pallas per-step cost: loop overhead, dynamic loads, band work.
Each variant runs STEPS iterations; fresh input per timed call."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 1 << 16
Q = 1 << 15
STEPS = 20000
W, C = 48, 128


def uload(ref2d, p, n):
    base = (p // 128) * 128
    rem = p - base
    m = ((n + 128 + 127) // 128) * 128
    blk = ref2d[0:1, pl.ds(pl.multiple_of(base, 128), m)]
    return pltpu.roll(blk, m - rem, 1)[0:1, :n]


def make(variant):
    def kernel(ref_ref, q_ref, out_ref):
        qstat = q_ref[0:1, 0:C]
        rstat = ref_ref[0:1, 0:C + W]

        def body(t, st):
            i, rp, acc = st
            if variant in ("loads", "full"):
                qblk = uload(q_ref, i, C)
                rblk = uload(ref_ref, rp, C + W)
            else:
                qblk, rblk = qstat, rstat
            if variant in ("band", "full"):
                lens = []
                for w in range(W):
                    s = jax.lax.slice(rblk, (0, w), (1, w + C))
                    lens.append(jnp.sum((s == qblk).astype(jnp.int32)))
                best = jnp.max(jnp.stack(lens))
            else:
                best = qblk[0, 0] + rblk[0, 0]
            acc = acc + best + i
            i = (i + 7) % (Q - C - 256)
            rp = (rp + 13) % (L - C - W - 256)
            return i, rp, acc

        _, _, acc = jax.lax.fori_loop(0, STEPS, body, (0, 0, jnp.int32(0)))
        out_ref[0, 0] = acc

    @jax.jit
    def run(ref, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(ref, q)

    return run


ref = jnp.asarray(np.random.randint(0, 4, (1, L)).astype(np.int32))
for variant in ("empty", "loads", "band", "full"):
    run = make(variant)
    q = jnp.asarray(np.random.randint(0, 4, (1, Q)).astype(np.int32))
    _ = int(run(ref, q)[0, 0])
    ts = []
    for _ in range(3):
        q2 = jnp.asarray(np.random.randint(0, 4, (1, Q)).astype(np.int32))
        t0 = time.perf_counter()
        v = int(run(ref, q2)[0, 0])  # host transfer forces completion
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{variant:6s}: {dt*1e3:7.2f}ms -> {dt/STEPS*1e6:6.3f}us/step",
          flush=True)
