"""Isolate the Mosaic (in-pallas) while-loop per-iteration costs that the
kernel's phase-doubling ledger cannot attribute: the loop boundary
itself, one VREG->SREG extract, one lax.cond boundary, and VREG state
threading. DESIGN.md's round-2 ledger leaves ~55% of per-event cost
unattributed to any phase; this pins how much of that is structural.

Run on the TPU tunnel: python scripts/calibrate_mosaic_loop.py [N_iters]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
I32 = jnp.int32


def timeit(f, reps=5):
    np.asarray(f())  # warm + force a real host transfer (tunnel lies)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f())
        best = min(best, time.perf_counter() - t0)
    return best


def make(variant):
    def kernel(o_ref):
        v = jnp.ones((8, 128), I32)

        if variant == "scalar":
            def body(st):
                i, acc = st
                return i + 1, acc + i
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)
        elif variant == "extract":
            def body(st):
                i, acc = st
                return i + 1, acc + jnp.max(v + i)
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)
        elif variant == "cond":
            def body(st):
                i, acc = st
                acc = jax.lax.cond(i & 1, lambda a: a + 1,
                                   lambda a: a + 2, acc)
                return i + 1, acc
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)
        elif variant == "vstate":
            def body(st):
                i, acc, vv = st
                return i + 1, acc + i, vv + 1
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0), v))
            o_ref[0:1, :] = jnp.full((1, 128), st[1] + jnp.max(st[2]), I32)
        elif variant == "vwork":
            # one (80,256) elementwise op + row-reduce per iter, result
            # NOT extracted to scalar (stays in a VREG carried forward)
            m = jnp.ones((80, 256), I32)

            def body(st):
                i, acc, vv = st
                r = jnp.max(m + i, axis=1, keepdims=True)  # (80,1)
                return i + 1, acc + i, vv + r[0:8, 0:1]
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0),
                                     jnp.zeros((8, 1), I32)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1] + jnp.max(st[2]), I32)
        elif variant == "chain":
            # one EVENT-like dependent chain per iter: scalar -> splat
            # window -> D dependent vector ops -> extract -> scalar that
            # the NEXT iteration depends on (defeats cross-iteration
            # pipelining, like the real kernel's per-event decisions)
            D = 16

            def body(st):
                i, acc = st
                x = jnp.full((80, 256), i, I32)
                for _ in range(D):
                    x = jnp.maximum(jnp.roll(x, 1, axis=1), x) + 1
                pk = jnp.max(x)
                return i + 1 + (pk & 0), acc + pk
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)
        elif variant == "chain2":
            # TWO independent event chains interleaved in one body
            # (straight-line, no cond): if per-iter cost ~= chain's, the
            # single chain is latency-bound and K-interleave hides it
            D = 16

            def body(st):
                i, j, acc = st
                x = jnp.full((80, 256), i, I32)
                y = jnp.full((80, 256), j + 7, I32)
                for _ in range(D):
                    x = jnp.maximum(jnp.roll(x, 1, axis=1), x) + 1
                    y = jnp.maximum(jnp.roll(y, 1, axis=1), y) + 1
                pk = jnp.max(x)
                pj = jnp.max(y)
                return (i + 1 + (pk & 0), j + 1 + (pj & 0),
                        acc + pk + pj)
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0),
                                     jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[2], I32)
        elif variant == "chain4":
            D = 16

            def body(st):
                ii, acc = st
                pks = []
                xs = [jnp.full((80, 256), ii + 7 * k, I32)
                      for k in range(4)]
                for _ in range(D):
                    xs = [jnp.maximum(jnp.roll(x, 1, axis=1), x) + 1
                          for x in xs]
                pks = [jnp.max(x) for x in xs]
                s = pks[0] + pks[1] + pks[2] + pks[3]
                return ii + 1 + (s & 0), acc + s
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)
        elif variant == "chaincond":
            # one chain: D straight-line ops, then a cond tail with D/2
            # more dependent ops (models the per-event decision tails:
            # ext_scan / anchor resolve live inside lax.conds)
            D = 16

            def tail(x):
                for _ in range(D // 2):
                    x = jnp.maximum(jnp.roll(x, 1, axis=1), x) + 1
                return x

            def body(st):
                i, acc = st
                x = jnp.full((80, 256), i, I32)
                for _ in range(D):
                    x = jnp.maximum(jnp.roll(x, 1, axis=1), x) + 1
                x = jax.lax.cond(i & 1, tail, lambda v: v + 1, x)
                pk = jnp.max(x)
                return i + 1 + (pk & 0), acc + pk
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)
        elif variant == "chain2cond":
            # two interleaved chains, each with its own cond tail: do the
            # cond regions serialize the other chain's work?
            D = 16

            def tail(x):
                for _ in range(D // 2):
                    x = jnp.maximum(jnp.roll(x, 1, axis=1), x) + 1
                return x

            def body(st):
                i, j, acc = st
                x = jnp.full((80, 256), i, I32)
                y = jnp.full((80, 256), j + 7, I32)
                for _ in range(D):
                    x = jnp.maximum(jnp.roll(x, 1, axis=1), x) + 1
                    y = jnp.maximum(jnp.roll(y, 1, axis=1), y) + 1
                x = jax.lax.cond(i & 1, tail, lambda v: v + 1, x)
                y = jax.lax.cond(j & 1, tail, lambda v: v + 1, y)
                pk = jnp.max(x)
                pj = jnp.max(y)
                return (i + 1 + (pk & 0), j + 1 + (pj & 0),
                        acc + pk + pj)
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0),
                                     jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[2], I32)
        return

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1, 128), I32))


def main():
    for variant in ("scalar", "extract", "cond", "vstate", "vwork", "chain", "chain2", "chain4", "chaincond", "chain2cond"):
        f = jax.jit(make(variant))
        dt = timeit(f)
        print(f"{variant:8s}: {dt*1e3:8.2f} ms total -> "
              f"{dt/N*1e9:7.1f} ns/iter", flush=True)


if __name__ == "__main__":
    with jax.enable_x64(False):
        main()
