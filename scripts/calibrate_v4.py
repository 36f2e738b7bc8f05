"""Calibrate the batched (K-pair interleaved) kernel primitives for the
v4 event-log kernel design. Each variant runs STEPS iterations of one
candidate building block inside a fori_loop with a data dependence (so
Mosaic can't hoist or DCE it); timing forces a host transfer (this
backend's block_until_ready lies — see memory note axon-tpu-environment).

Usage: python scripts/calibrate_v4.py [variant ...]
Variants: band_K{1,2,4,8,16}, lce_K{1,4,8,16}, gather_K{4,8,16},
          loads_K{4,8,16}, mxu_K{4,8,16}, carry_K{8,16}
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = int(os.environ.get("STEPS", 2000))
QROWS = 80
RCOLS = 256
LQ = 1 << 16


def _dshift(M, step, ri, ci):
    R, C = M.shape
    M2 = pltpu.roll(pltpu.roll(M, R - step, 0), C - step, 1)
    return jnp.where((ri < R - step) & (ci < C - step), M2, 0)


def make(variant):
    kind, k = variant.rsplit("_K", 1)
    K = int(k)
    R = K * QROWS

    def kernel(ref_ref, q_ref, out_ref, *scratch):
        ri = jax.lax.broadcasted_iota(jnp.int32, (R, RCOLS), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (R, RCOLS), 1)

        def body(t, acc):
            if kind == "band":
                # representative superstep: E build (from resident rows) +
                # run_detect(msl=7: 3 stages) + geo + 2 row reductions
                base = (t * 7) % 512
                rrow = ref_ref[0:1, pl.ds(pl.multiple_of(0, 128), RCOLS)]
                E = (scratch[0][:, :] == (rrow + acc % 2)).astype(jnp.int32)
                A = E
                for stp in (1, 2, 3):
                    A = A * _dshift(A, stp, ri, ci)
                geo = (ri % QROWS < 41) & (ci < 120 + ri % QROWS)
                Am = jnp.where(geo, A, 0)
                m1 = jnp.max(Am, axis=1, keepdims=True)
                m2 = jnp.max(jnp.where(Am > 0, ci, -1), axis=1,
                             keepdims=True)
                acc = acc + jnp.sum(m1) + jnp.sum(m2) + base
            elif kind == "lce":
                # saturation-doubling capped LCE, CAP=32 (5 stages)
                rrow = ref_ref[0:1, 0:RCOLS]
                E = (scratch[0][:, :] == (rrow + acc % 2)).astype(jnp.int32)
                S = E
                stp = 1
                while stp < 32:
                    M2 = pltpu.roll(pltpu.roll(S, R - stp, 0),
                                    RCOLS - stp, 1)
                    take = (S == stp) & (ri < R - stp) & (ci < RCOLS - stp)
                    S = S + jnp.where(take, M2, 0)
                    stp *= 2
                acc = acc + jnp.sum(jnp.max(S, axis=1, keepdims=True))
            elif kind == "gather":
                # batched per-pair dynamic row loads via 2D crossbar gather
                offs = ((t * 7 + acc % 4) % (LQ - 300))
                idx = (jax.lax.broadcasted_iota(jnp.int32, (K, RCOLS), 1)
                       + offs
                       + jax.lax.broadcasted_iota(jnp.int32, (K, RCOLS), 0))
                g = jnp.take_along_axis(q_ref[:, :], idx, axis=1)
                acc = acc + jnp.sum(g[:, 0:1]) + g[K - 1, 1]
            elif kind == "loads":
                # K unrolled aligned loads + rolls stacked via scratch rows
                offs = ((t * 7 + acc % 4) % (LQ - 400))
                tot = jnp.int32(0)
                for j in range(K):
                    p = offs + j * 3
                    base = (p // 128) * 128
                    blk = q_ref[j:j + 1,
                                pl.ds(pl.multiple_of(base, 128), RCOLS)]
                    r = pltpu.roll(blk, RCOLS - (p - base), 1)
                    scratch[1][j:j + 1, :] = r
                    tot = tot + r[0, 0]
                acc = acc + tot + scratch[1][K - 1, 1]
            elif kind == "mxu":
                # the ext_scan window contraction, batched K rows
                m = (scratch[1][0:K, 0:128] + acc % 2).astype(jnp.float32)
                W2 = jax.lax.dot_general(
                    m, scratch[2][:, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                acc = acc + jnp.sum(jnp.max(W2, axis=1, keepdims=True))
            elif kind == "hankel":
                # diagonal-layout superstep: per-pair Hankel band (80,128)
                # built by ONE crossbar gather from repeated rows; runs go
                # along LANES (lane rolls only); reduction is per-lane.
                offs = ((t * 7 + acc % 4) % (LQ - 400))
                # per-pair window rows (K,256) via unrolled loads
                for j in range(K):
                    p = offs + j * 5
                    base = (p // 128) * 128
                    blk = q_ref[j:j + 1,
                                pl.ds(pl.multiple_of(base, 128), 256 + 128)]
                    r = pltpu.roll(blk, 384 - (p - base), 1)
                    scratch[3][j:j + 1, :] = r[0:1, :256]
                src = pltpu.repeat(scratch[3][:, :], QROWS, axis=0)
                ri80 = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
                ci80 = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
                idx = (ri80 % QROWS) + ci80
                rbc = jnp.take_along_axis(src, idx, axis=1)
                qrow = q_ref[0:K, 0:128]
                qbig = pltpu.repeat(qrow, QROWS, axis=0)
                E = (qbig == rbc).astype(jnp.int32)
                A = E
                for stp in (1, 2, 3):
                    A2 = pltpu.roll(A, 128 - stp, 1)
                    A = A * jnp.where(ci80 < 128 - stp, A2, 0)
                geo = (ci80 < 41) & ((ri80 % QROWS) < 80)
                Am = jnp.where(geo, A, 0)
                m1 = jnp.max(Am, axis=0, keepdims=True)  # per-lane any
                acc = acc + jnp.sum(m1) + rbc[0, 0]
            elif kind == "repeat":
                # pltpu.repeat cost on (K,256) -> (K*80,256)
                src = pltpu.repeat(scratch[3][:, :] + acc % 3, QROWS, axis=0)
                acc = acc + src[0, 0] + src[R - 1, 1]
            elif kind == "extb":
                # batched ext_scan chunk: K rows, one MXU window contraction
                offs = ((t * 7 + acc % 4) % (LQ - 400))
                for j in range(K):
                    p = offs + j * 3
                    base = (p // 128) * 128
                    blk = q_ref[j:j + 1,
                                pl.ds(pl.multiple_of(base, 128), 256)]
                    scratch[1][j:j + 1, 0:128] = (
                        pltpu.roll(blk, 256 - (p - base), 1)[0:1, :128])
                m = (scratch[1][0:K, 0:128] > 2).astype(jnp.float32)
                W2 = jax.lax.dot_general(
                    m, scratch[2][:, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(jnp.int32)
                io = jax.lax.broadcasted_iota(jnp.int32, (K, 256), 1)
                ok = (W2 == 0) & (io < 200)
                last = jnp.max(jnp.where(ok, io, 0), axis=1, keepdims=True)
                acc = acc + jnp.sum(last)
            elif kind == "carry":
                # big unrolled scalar carry (K pairs x 8 scalars) loop cost
                tot = jnp.int32(0)
                for j in range(K):
                    tot = tot + acc % (j + 2)
                acc = acc + tot
            return acc

        acc = jax.lax.fori_loop(0, STEPS, body, jnp.int32(0))
        out_ref[0, 0] = acc

    scratch_shapes = [
        pltpu.VMEM((R, RCOLS), jnp.int32),
        pltpu.VMEM((max(K, 8), RCOLS), jnp.int32),
        pltpu.VMEM((128, 256), jnp.float32),
        pltpu.VMEM((max(K, 8), 256), jnp.int32),
    ]

    @jax.jit
    def run(ref, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=scratch_shapes,
        )(ref, q)

    return run, K


def main():
    ref = jnp.asarray(np.random.randint(0, 6, (1, 1 << 17)).astype(np.int32))
    variants = sys.argv[1:] or [
        "band_K1", "band_K4", "band_K8", "band_K16",
        "lce_K1", "lce_K8",
        "gather_K8", "gather_K16",
        "loads_K8", "loads_K16",
        "mxu_K8", "carry_K16",
    ]
    for variant in variants:
        try:
            run, K = make(variant)
            q = jnp.asarray(
                np.random.randint(0, 6, (max(K, 8), LQ)).astype(np.int32))
            _ = int(run(ref, q)[0, 0])  # compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                v = int(run(ref, q)[0, 0])
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            print(f"{variant:12s}: {dt*1e3:8.2f}ms  {dt/STEPS*1e6:8.3f}us/step"
                  f"  {dt/STEPS/K*1e6:8.3f}us/step/pair", flush=True)
        except Exception as e:
            print(f"{variant:12s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
