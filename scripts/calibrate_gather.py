"""Test Mosaic in-kernel vectorized gather: jnp.take/dynamic_gather shapes.
Cost model target: hash-table probes for 128 kmers at once."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = int(__import__("os").environ.get("STEPS", 5000))
R, CC = 1024, 128   # table as 2D (R, 128)


def make(variant):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:, :]          # (R, 128) in registers? (VMEM read full)
        def body(t, st):
            i, acc = st
            iv = idx_ref[0:1, pl.ds(pl.multiple_of((i % 64) * 128, 128), 128)]
            if variant == "take_rows":
                # gather 128 rows of tab by vector index -> (128, 128)
                g = jnp.take(tab, iv[0] % R, axis=0)
                acc = acc + jnp.sum(g[:, 0])
            elif variant == "take_flat_2d":
                # gather within last dim: (1,128) indices into (1, R*? ) won't
                # fit; use one row (1, CC) gathered by lane indices
                row = tab[0:1, :]
                g = jnp.take_along_axis(
                    jnp.broadcast_to(row, (1, CC)), iv % CC, axis=1)
                acc = acc + jnp.sum(g)
            return i + 1, acc

        _, acc = jax.lax.fori_loop(0, STEPS, body, (0, jnp.int32(0)))
        out_ref[0, 0] = acc

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tab, idx)

    return run


tab = jnp.asarray(np.random.randint(0, 100, (R, CC)).astype(np.int32))
idx = jnp.asarray(np.random.randint(0, 1 << 20, (1, 8192)).astype(np.int32))

for variant in sys.argv[1:] or ["take_flat_2d"]:
    try:
        run = make(variant)
        _ = int(run(tab, idx)[0, 0])
        ts = []
        for _ in range(3):
            idx2 = jnp.asarray(
                np.random.randint(0, 1 << 20, (1, 8192)).astype(np.int32))
            t0 = time.perf_counter()
            v = int(run(tab, idx2)[0, 0])
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{variant:14s}: {dt*1e3:8.2f}ms total -> "
              f"{dt/STEPS*1e6:7.3f}us/step (128 elems/step)", flush=True)
    except Exception as e:
        msg = str(e)
        for line in msg.splitlines():
            if ("Not implemented" in line or "NotImplemented" in line
                    or "Mosaic failed" in line or "Unsupported" in line):
                print(f"{variant:14s}: FAIL {line.strip()[:150]}", flush=True)
                break
        else:
            print(f"{variant:14s}: FAIL {msg[:200]}", flush=True)
