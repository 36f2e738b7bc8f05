"""Prototype the risky Mosaic mechanics for the automaton kernel:
  A. scalar element store to VMEM output + scalar loads from VMEM input
  B. binary-lifting LCE matrix (diagonal run lengths), checked vs numpy
  C. find-first reduction + scalar extract + while_loop/cond nesting
Run each standalone; print PASS/FAIL.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

which = set(sys.argv[1:] or ["A", "B", "C"])

# --------------------------------------------------------------- A
if "A" in which:
    def kernel_a(in_ref, out_ref):
        def body(t, acc):
            v = in_ref[0, t]          # scalar load, dynamic index
            out_ref[0:1, pl.ds(t * 2, 1)] = (v + 1).reshape(1, 1)
            return acc + v

        acc = jax.lax.fori_loop(0, 64, body, jnp.int32(0))
        out_ref[1:2, 0:1] = acc.reshape(1, 1)

    @jax.jit
    def run_a(x):
        return pl.pallas_call(
            kernel_a,
            out_shape=jax.ShapeDtypeStruct((2, 256), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    try:
        x = jnp.asarray(np.arange(256, dtype=np.int32)[None, :])
        o = np.asarray(run_a(x))
        ok = all(o[0, t * 2] == t + 1 for t in range(64)) \
            and o[1, 0] == 64 * 63 // 2
        print(f"A scalar load/store: {'PASS' if ok else 'FAIL ' + str(o[0,:8])}",
              flush=True)
    except Exception as e:
        print(f"A scalar load/store: FAIL {str(e)[:4000]}", flush=True)

# --------------------------------------------------------------- B
if "B" in which:
    DA, WB, CAP = 64, 128, 64  # future-positions x band-offsets, cap 64

    def lce_matrix(qv, rv):
        """S[d, w] = min(CAP, LCE(q[d:], r[w:])) for d<DA, w<WB.
        qv: (1, DA+CAP) query block; rv: (1, WB+CAP) ref block."""
        # E[d, w] = q[d] == r[w] extended over the needed diagonal range
        q2 = qv.T                               # (DA+CAP, 1)
        E = (q2 == rv).astype(jnp.int32)        # (DA+CAP, WB+CAP)
        S = E
        A = E
        step = 1
        while step < CAP:
            # diagonal shift by `step`: A[a+step, b+step]
            Ash = jnp.pad(A[step:, step:], ((0, step), (0, step)))
            Ssh = jnp.pad(S[step:, step:], ((0, step), (0, step)))
            S = S + A * Ssh
            A = A * Ash
            step *= 2
        return S[:DA, :WB]

    def kernel_b(q_ref, r_ref, out_ref):
        out_ref[:, :] = lce_matrix(q_ref[0:1, :DA + CAP],
                                   r_ref[0:1, :WB + CAP])

    @jax.jit
    def run_b(q, r):
        return pl.pallas_call(
            kernel_b,
            out_shape=jax.ShapeDtypeStruct((DA, WB), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(q, r)

    try:
        rng = np.random.RandomState(0)
        qn = rng.randint(0, 4, (1, DA + CAP)).astype(np.int32)
        rn = rng.randint(0, 4, (1, WB + CAP)).astype(np.int32)
        got = np.asarray(run_b(jnp.asarray(qn), jnp.asarray(rn)))
        want = np.zeros((DA, WB), np.int32)
        for d in range(DA):
            for w in range(WB):
                l = 0
                while l < CAP and qn[0, d + l] == rn[0, w + l]:
                    l += 1
                want[d, w] = l
        ok = np.array_equal(got, want)
        print(f"B LCE doubling matrix: {'PASS' if ok else 'FAIL'}", flush=True)
        if not ok:
            bad = np.argwhere(got != want)[:5]
            for d, w in bad:
                print(f"  [{d},{w}] got {got[d,w]} want {want[d,w]}")
        # timing
        _ = np.asarray(run_b(jnp.asarray(qn), jnp.asarray(rn)))
        t0 = time.perf_counter()
        reps = 50
        for _ in range(reps):
            o = run_b(jnp.asarray(qn), jnp.asarray(rn))
        _ = np.asarray(o)
        print(f"  (incl dispatch amortized: "
              f"{(time.perf_counter()-t0)/reps*1e3:.2f}ms/call)", flush=True)
    except Exception as e:
        print(f"B LCE doubling matrix: FAIL {str(e)[:4000]}", flush=True)

# --------------------------------------------------------------- C
if "C" in which:
    def kernel_c(m_ref, out_ref):
        # find first row with any element >= 7, via masked iota min
        M = m_ref[:, :]                       # (8, 128)
        hit = jnp.any(M >= 7, axis=1)         # (8,)
        rid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)[:, 0]
        first = jnp.min(jnp.where(hit, rid, 127))
        # nested while/cond on scalars
        def body(st):
            k, acc = st
            acc = jax.lax.cond(k % 2 == 0, lambda a: a + first,
                               lambda a: a + 1, acc)
            return k + 1, acc

        _, acc = jax.lax.while_loop(lambda st: st[0] < 10, body,
                                    (jnp.int32(0), jnp.int32(0)))
        out_ref[0, 0] = first
        out_ref[0, 1] = acc

    @jax.jit
    def run_c(m):
        return pl.pallas_call(
            kernel_c,
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(m)

    try:
        m = np.zeros((8, 128), np.int32)
        m[3, 77] = 9
        m[6, 2] = 8
        o = np.asarray(run_c(jnp.asarray(m)))
        ok = o[0, 0] == 3 and o[0, 1] == 5 * 3 + 5
        print(f"C find-first + nesting: {'PASS' if ok else 'FAIL ' + str(o)}",
              flush=True)
    except Exception as e:
        print(f"C find-first + nesting: FAIL {str(e)[:4000]}", flush=True)
