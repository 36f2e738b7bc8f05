"""Measure per-step cost of automaton-shaped work inside a Pallas kernel:
sequential loop, unaligned dynamic VMEM loads (aligned load + dynamic roll),
VPU band compare + reductions."""
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
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
W = 48
C = 128


def uload(ref2d, p, n):
    """Load (1, n) at dynamic unaligned offset p from row 0 of ref2d."""
    base = (p // 128) * 128
    rem = p - base
    m = ((n + 128 + 127) // 128) * 128  # lane-aligned total load
    blk = ref2d[0:1, pl.ds(pl.multiple_of(base, 128), m)]
    rolled = pltpu.roll(blk, m - rem, 1)
    return rolled[0:1, :n]


def kernel(ref_ref, q_ref, out_ref):
    def body(t, st):
        i, rp, acc = st
        qblk = uload(q_ref, i, C)              # (1, C)
        rblk = uload(ref_ref, rp, C + W)       # (1, C+W)
        lens = []
        for w in range(W):
            shifted = jax.lax.slice(rblk, (0, w), (1, w + C))
            lens.append(jnp.sum((shifted == qblk).astype(jnp.int32)))
        best = jnp.max(jnp.stack(lens))
        acc = acc + best
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


ref = jnp.asarray(np.random.randint(0, 4, (1, L)).astype(np.int32))
q = jnp.asarray(np.random.randint(0, 4, (1, Q)).astype(np.int32))

out = run(ref, q)
jax.block_until_ready(out)
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    out = run(ref, q)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / reps
print(f"pallas superstep x{STEPS}: {dt*1e3:.2f}ms -> "
      f"{dt/STEPS*1e6:.3f}us/step", flush=True)

# --- validity check: fresh inputs per call, inspect outputs -----------------
for rep in range(3):
    q2 = jnp.asarray(np.random.randint(0, 4, (1, Q)).astype(np.int32))
    t0 = time.perf_counter()
    o = run(ref, q2)
    o.block_until_ready()
    print(f"fresh-input call: {1e3*(time.perf_counter()-t0):.2f}ms out={int(o[0,0])}",
          flush=True)
