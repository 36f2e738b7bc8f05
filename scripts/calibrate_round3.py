"""Round-3 design microbenches (extends calibrate_mosaic_loads.py).

Questions, each motivating one kernel lever:
  Q1 overlap   — does a dependent scalar-load chain overlap with an
                 INDEPENDENT dependent VPU chain ((80,256) roll+max) in
                 the same loop body? -> speculative window build hides
                 behind the decision chain.
  Q2 lane      — scalar from an already-resident (1,128) row at a dynamic
                 lane (roll+extract) vs a fresh dynamic load+roll+extract
                 -> cand probe served from the window's cvec.
  Q3 pairload  — 2 loads at independent offsets per dependent step vs 1
                 -> window q+r / ext q+r load pairs price.
  Q4 dma       — HBM(ANY)->VMEM dynamic-offset DMA round trip vs a VMEM
                 dynamic load -> the paged long-genome kernel's currency.

Run: python scripts/calibrate_round3.py [N_iters]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
I32 = jnp.int32
L = 1 << 15
DEPTH = 4          # dependent loads per loop iteration
VOPS = 20          # VPU chain ops per loop iteration (window-build scale)


def align_load(ref, p, n):
    base = (p // 128) * 128
    rem = p - base
    m = n + 128
    blk = ref[0:1, pl.ds(pl.multiple_of(base, 128), m)]
    return pltpu.roll(blk, m - rem, 1)[0:1, :n]


def timeit(f, *a, reps=5):
    np.asarray(f(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def scalar_chain(buf, seed, depth=DEPTH, two=False):
    p = seed
    for _ in range(depth):
        row = align_load(buf, p, 128)
        if two:
            row2 = align_load(buf, (p * 5 + 101) % (L - 512), 128)
            p = (jnp.max(row) + jnp.max(row2) + p + 13) % (L - 512)
        else:
            p = (jnp.max(row) + p + 13) % (L - 512)
    return p


def vpu_chain(M, ri, ci, ops=VOPS):
    for k in range(ops):
        M = jnp.where((ri < 80 - 1) & (ci < 256 - 1),
                      pltpu.roll(pltpu.roll(M, 79, 0), 255, 1), 0) + M
        M = jnp.minimum(M, 7)
    return M


def make(variant):
    def kernel(buf, o_ref):
        ri = jax.lax.broadcasted_iota(I32, (80, 256), 0)
        ci = jax.lax.broadcasted_iota(I32, (80, 256), 1)

        if variant == "scalar":
            def body(st):
                i, acc = st
                return i + 1, acc + scalar_chain(buf, acc % (L - 512))
            st = jax.lax.while_loop(lambda s: s[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)
        elif variant == "vpu":
            def body(st):
                i, M = st
                return i + 1, vpu_chain(M, ri, ci)
            st = jax.lax.while_loop(
                lambda s: s[0] < N, body,
                (jnp.int32(0), jnp.zeros((80, 256), I32) + 1))
            o_ref[0:1, :] = st[1][0:1, 0:128]
        elif variant == "scalar+vpu":
            # Q1: the two chains are INDEPENDENT within an iteration —
            # if Mosaic overlaps scalar-port and VPU work, this costs
            # ~max(scalar, vpu), not the sum
            def body(st):
                i, acc, M = st
                pk = scalar_chain(buf, acc % (L - 512))
                M = vpu_chain(M, ri, ci)
                return i + 1, acc + pk, M
            st = jax.lax.while_loop(
                lambda s: s[0] < N, body,
                (jnp.int32(0), jnp.int32(0),
                 jnp.zeros((80, 256), I32) + 1))
            o_ref[0:1, :] = (jnp.full((1, 128), st[1], I32)
                             + st[2][0:1, 0:128])
        elif variant == "scalar+vpu_ilv":
            # Q1b: same ops, emitted alternated (vpu op between loads)
            def body(st):
                i, acc, M = st
                p = acc % (L - 512)
                for k in range(DEPTH):
                    row = align_load(buf, p, 128)
                    M = vpu_chain(M, ri, ci, ops=VOPS // DEPTH)
                    p = (jnp.max(row) + p + 13) % (L - 512)
                return i + 1, acc + p, M
            st = jax.lax.while_loop(
                lambda s: s[0] < N, body,
                (jnp.int32(0), jnp.int32(0),
                 jnp.zeros((80, 256), I32) + 1))
            o_ref[0:1, :] = (jnp.full((1, 128), st[1], I32)
                             + st[2][0:1, 0:128])
        elif variant == "lane_load":
            # Q2 baseline: fresh dynamic load + roll + extract per step
            def body(st):
                i, acc = st
                p = acc % (L - 512)
                for _ in range(DEPTH):
                    base = (p // 128) * 128
                    rem = p - base
                    blk = buf[0:1, pl.ds(pl.multiple_of(base, 128), 128)]
                    v = pltpu.roll(blk, 128 - rem, 1)[0, 0]
                    p = (v + p + 13) % (L - 512)
                return i + 1, acc + p
            st = jax.lax.while_loop(lambda s: s[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)
        elif variant == "lane_res":
            # Q2: dynamic LANE of an already-resident row (roll+extract)
            def body(st):
                i, acc, row = st
                p = acc % 128
                for _ in range(DEPTH):
                    v = pltpu.roll(row, 128 - p, 1)[0, 0]
                    p = (v + p + 13) % 128
                return i + 1, acc + p, row
            st = jax.lax.while_loop(
                lambda s: s[0] < N, body,
                (jnp.int32(0), jnp.int32(0), buf[0:1, 0:128]))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)
        elif variant == "pairload":
            # Q3: two independent loads per dependent step
            def body(st):
                i, acc = st
                return i + 1, acc + scalar_chain(buf, acc % (L - 512),
                                                 two=True)
            st = jax.lax.while_loop(lambda s: s[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), I32),
        in_specs=[pl.BlockSpec((1, L), lambda: (0, 0),
                               memory_space=pltpu.VMEM)])


def make_dma(depth=DEPTH):
    """Q4: per-step dynamic-offset DMA from an ANY(HBM) buffer into VMEM
    scratch, then extract — the paged kernel's load primitive."""
    def kernel(hbm, o_ref):
        def inner(scratch, sem):
            def body(st):
                i, acc = st
                p = acc % (L - 512)
                for _ in range(depth):
                    base = (p // 128) * 128
                    cp = pltpu.make_async_copy(
                        hbm.at[0:1, pl.ds(pl.multiple_of(base, 128), 256)],
                        scratch, sem)
                    cp.start()
                    cp.wait()
                    rem = p - base
                    v = pltpu.roll(scratch[:], 256 - rem, 1)[0, 0]
                    p = (v + p + 13) % (L - 512)
                return i + 1, acc + p
            st = jax.lax.while_loop(lambda s: s[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)

        pl.run_scoped(inner,
                      scratch=pltpu.VMEM((1, 256), I32),
                      sem=pltpu.SemaphoreType.DMA(()))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), I32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))


def main():
    buf = jnp.asarray(np.random.randint(0, 64, (1, L)), I32)
    res = {}
    for variant in ("scalar", "vpu", "scalar+vpu", "scalar+vpu_ilv",
                    "lane_load", "lane_res", "pairload"):
        f = jax.jit(make(variant))
        dt = timeit(f, buf)
        res[variant] = dt / N * 1e9
        print(f"{variant:16s}: {dt/N*1e9:8.1f} ns/iter", flush=True)
    print(f"Q1 overlap: sum={res['scalar']+res['vpu']:.0f} "
          f"combined={res['scalar+vpu']:.0f} "
          f"ilv={res['scalar+vpu_ilv']:.0f} "
          f"(max={max(res['scalar'], res['vpu']):.0f})")
    print(f"Q2 lane: fresh={res['lane_load']/DEPTH:.0f} "
          f"resident={res['lane_res']/DEPTH:.0f} ns/step")
    print(f"Q3 pair: single={res['scalar']/DEPTH:.0f} "
          f"pair={res['pairload']/DEPTH:.0f} ns/step")
    try:
        f = jax.jit(make_dma())
        dt = timeit(f, buf)
        print(f"Q4 dma: {dt/N/DEPTH*1e9:8.1f} ns per HBM-DMA round trip "
              f"(vs {res['lane_load']/DEPTH:.0f} VMEM)", flush=True)
    except Exception as e:
        print(f"Q4 dma: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    with jax.enable_x64(False):
        main()
