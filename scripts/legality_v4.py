"""Mosaic legality probes for the v4 interleaved kernel's building blocks.
Tiny shapes (fast compiles); each probe compiles + runs one candidate
construct and prints OK/FAIL. Run on TPU (one process!).

Probes:
  lane16   static 16-aligned lane slice read+write on (80,128)
  vshift   per-element variable shift amounts (right_shift by vector)
  dynsub   dynamic sublane slice pl.ds(dd, 48) on (80,256)
  int8ld   (1,128) int8 load + convert to int32 + roll
  repeat   pltpu.repeat (8,256) -> (640,256) row-block replication
  gather   take_along_axis (80,256) -> (80,128) crossbar
  packmxu  E (80,256) @ P (256,128) f32 bit-weight pack (16-bit groups)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, build):
    try:
        t0 = time.time()
        out = build()
        v = np.asarray(out)
        print(f"{name:8s}: OK  ({time.time()-t0:.1f}s) sample={v.flat[0]}",
              flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name:8s}: FAIL {type(e).__name__}: {msg}", flush=True)


def run_kernel(kernel, out_shape, *args, scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(*out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
    )(*args)


def main():
    A = jnp.asarray(np.random.randint(0, 6, (80, 256)).astype(np.int32))
    v8 = jnp.asarray(np.random.randint(0, 6, (8, 256)).astype(np.int32))
    b8 = jnp.asarray(np.random.randint(0, 120, (1, 128)).astype(np.int8))
    P = np.zeros((256, 128), np.float32)
    for c in range(256):
        P[c, c // 16] = float(1 << (c % 16))
    Pm = jnp.asarray(P)

    def lane16(a_ref, o_ref, s_ref):
        for k in range(8):
            s_ref[:, k * 16:(k + 1) * 16] = (
                a_ref[:, k * 16:(k + 1) * 16] + k)
        o_ref[:, :] = s_ref[:, 0:128]

    probe("lane16", lambda: run_kernel(
        lane16, ((80, 128), jnp.int32), A,
        scratch=[pltpu.VMEM((80, 128), jnp.int32)]))

    def vshift(a_ref, o_ref):
        sh = jax.lax.broadcasted_iota(jnp.int32, (80, 128), 1) % 16
        o_ref[:, :] = jax.lax.shift_right_logical(a_ref[:, 0:128], sh)

    probe("vshift", lambda: run_kernel(vshift, ((80, 128), jnp.int32), A))

    def dynsub(a_ref, o_ref):
        dd = a_ref[0, 0] % 32
        o_ref[:, :] = a_ref[pl.ds(dd, 48), :]

    probe("dynsub", lambda: run_kernel(dynsub, ((48, 256), jnp.int32), A))

    def int8ld(b_ref, o_ref):
        x = b_ref[0:1, :].astype(jnp.int32)
        o_ref[:, :] = pltpu.roll(x, 5, 1)

    probe("int8ld", lambda: run_kernel(int8ld, ((1, 128), jnp.int32), b8))

    def repeat(v_ref, o_ref):
        o_ref[:, :] = pltpu.repeat(v_ref[:, :], 80, axis=0)

    probe("repeat", lambda: run_kernel(repeat, ((640, 256), jnp.int32), v8))

    def gather(a_ref, o_ref):
        idx = (jax.lax.broadcasted_iota(jnp.int32, (80, 128), 0) % 80
               + jax.lax.broadcasted_iota(jnp.int32, (80, 128), 1))
        o_ref[:, :] = jnp.take_along_axis(a_ref[:, :], idx, axis=1)

    probe("gather", lambda: run_kernel(gather, ((80, 128), jnp.int32), A))

    def packmxu(a_ref, p_ref, o_ref):
        e = (a_ref[:, :] < 3).astype(jnp.float32)
        w = jax.lax.dot_general(e, p_ref[:, :], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:, :] = w.astype(jnp.int32)

    probe("packmxu", lambda: pl.pallas_call(
        packmxu,
        out_shape=jax.ShapeDtypeStruct((80, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(A, Pm))


if __name__ == "__main__":
    main()
