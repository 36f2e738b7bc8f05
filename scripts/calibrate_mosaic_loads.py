"""Measure the Mosaic cost of align_load-style dynamic-offset VMEM loads
(the pattern of the kernel's window build, ext_scan and exact_lce), and
whether chains of dependent loads from independent pairs interleave the
way pure-VPU chains do (scripts/calibrate_mosaic_loop.py).

Run: python scripts/calibrate_mosaic_loads.py [N_iters]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
I32 = jnp.int32
L = 1 << 15


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


def make(variant, depth):
    def kernel(buf, o_ref):
        def chain(seed):
            """`depth` DEPENDENT dynamic loads: each offset derives from
            the previous load's extracted value (exact_lce's shape)."""
            p = seed
            for _ in range(depth):
                row = align_load(buf, p, 128)
                p = (jnp.max(row) + p + 13) % (L - 512)
            return p

        if variant == "load1":
            def body(st):
                i, acc = st
                pk = chain(acc % (L - 512))
                return i + 1, acc + pk
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)
        elif variant == "load2":
            def body(st):
                i, a, b = st
                pa = chain(a % (L - 512))
                pb = chain((b + 7) % (L - 512))
                return i + 1, a + pa, b + pb
            st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                    (jnp.int32(0), jnp.int32(0),
                                     jnp.int32(1)))
            o_ref[0:1, :] = jnp.full((1, 128), st[1] + st[2], I32)
        elif variant == "load4":
            def body(st):
                i, accs = st[0], list(st[1:])
                for k in range(4):
                    accs[k] = accs[k] + chain((accs[k] + 3 * k)
                                              % (L - 512))
                return (i + 1, *accs)
            st = jax.lax.while_loop(
                lambda st: st[0] < N, body,
                (jnp.int32(0), jnp.int32(0), jnp.int32(1), jnp.int32(2),
                 jnp.int32(3)))
            o_ref[0:1, :] = jnp.full((1, 128),
                                     st[1] + st[2] + st[3] + st[4], I32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), I32),
        in_specs=[pl.BlockSpec((1, L), lambda: (0, 0),
                               memory_space=pltpu.VMEM)])


def make_alt(K, depth):
    """K dependent chains with ALTERNATED per-op emission (the v5/v6
    interleave shape): step j of every chain is emitted together, so
    Mosaic sees K independent loads per dependent step. This is the
    packed-band GO/NO-GO number — per-pair scalar-floor amortization at
    interleave width K."""
    def kernel(buf, o_ref):
        def body(st):
            i, accs = st[0], list(st[1:])
            ps = [(accs[k] + 3 * k) % (L - 512) for k in range(K)]
            for _ in range(depth):
                rows = [align_load(buf, ps[k], 128) for k in range(K)]
                ps = [(jnp.max(rows[k]) + ps[k] + 13) % (L - 512)
                      for k in range(K)]
            return (i + 1, *[a + p for a, p in zip(accs, ps)])
        st = jax.lax.while_loop(
            lambda st: st[0] < N, body,
            (jnp.int32(0), *[jnp.int32(k) for k in range(K)]))
        tot = st[1]
        for k in range(2, K + 1):
            tot = tot + st[k]
        o_ref[0:1, :] = jnp.full((1, 128), tot, I32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), I32),
        in_specs=[pl.BlockSpec((1, L), lambda: (0, 0),
                               memory_space=pltpu.VMEM)])


def make2(variant, depth):
    """Component pricing of the align_load round-trip."""
    def kernel(buf, o_ref):
        def step(p, kind):
            if kind == "aligned":       # static-within-iter 128-mult offset, no roll
                base = (p // 128) * 128
                row = buf[0:1, pl.ds(pl.multiple_of(base, 128), 128)]
            elif kind == "noroll":      # dynamic slice, skip the roll
                base = (p // 128) * 128
                row = buf[0:1, pl.ds(pl.multiple_of(base, 128), 256)][:, :128]
            elif kind == "full":        # align_load: slice + scalar roll
                row = align_load(buf, p, 128)
            elif kind == "extonly":     # no load: VPU op + extract only
                row = jnp.full((1, 128), p, I32)
            return (jnp.max(row) + p + 13) % (L - 512)

        kind = variant
        def body(st):
            i, acc = st
            p = acc % (L - 512)
            for _ in range(depth):
                p = step(p, kind)
            return i + 1, acc + p
        st = jax.lax.while_loop(lambda st: st[0] < N, body,
                                (jnp.int32(0), jnp.int32(0)))
        o_ref[0:1, :] = jnp.full((1, 128), st[1], I32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), I32),
        in_specs=[pl.BlockSpec((1, L), lambda: (0, 0),
                               memory_space=pltpu.VMEM)])

def main():
    buf = jnp.asarray(np.random.randint(0, 64, (1, L)), I32)
    for variant in ("extonly", "aligned", "noroll", "full"):
        f = jax.jit(make2(variant, 8))
        dt = timeit(f, buf)
        print(f"component {variant:8s}: {dt/N/8*1e9:6.1f} ns per round-trip",
              flush=True)
    for depth in (4, 8):
        for variant in ("load1", "load2", "load4"):
            f = jax.jit(make(variant, depth))
            dt = timeit(f, buf)
            nch = {"load1": 1, "load2": 2, "load4": 4}[variant]
            print(f"depth={depth} {variant}: {dt/N*1e9:7.1f} ns/iter "
                  f"({dt/N/depth/nch*1e9:6.1f} ns per load)", flush=True)
    base = None
    for K in (1, 2, 4, 8):
        f = jax.jit(make_alt(K, 8))
        dt = timeit(f, buf)
        if K == 1:
            base = dt
        print(f"alt K={K}: {dt/N*1e9:7.1f} ns/iter = {dt/base:4.2f}x K=1 "
              f"(per-chain amortization {dt/base/K:4.2f}x)", flush=True)


if __name__ == "__main__":
    with jax.enable_x64(False):
        main()
