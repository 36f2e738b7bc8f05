"""Measure TPU primitive costs that drive the engine design:
gathers, per-lane dynamic slices, while_loop overhead, searchsorted, sort."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


L = 1 << 17
ref = jnp.asarray(np.random.randint(0, 4, L).astype(np.uint8))
ref32 = ref.astype(jnp.int32)

# 1. random gather, N elements
for N in (1 << 14, 1 << 18, 1 << 22):
    idx = jnp.asarray(np.random.randint(0, L, N).astype(np.int32))
    f = jax.jit(lambda i: ref[i].sum())
    dt = timeit(f, idx)
    print(f"gather u8 N={N}: {dt*1e3:.3f}ms -> {N/dt/1e6:.1f} Melem/s",
          flush=True)
    f32 = jax.jit(lambda i: ref32[i].sum())
    dt = timeit(f32, idx)
    print(f"gather i32 N={N}: {dt*1e3:.3f}ms -> {N/dt/1e6:.1f} Melem/s",
          flush=True)

# 2. vmapped contiguous dynamic_slice, B lanes x C bytes
for B, C in ((1024, 128), (4096, 128), (1024, 512)):
    starts = jnp.asarray(np.random.randint(0, L - C, B).astype(np.int32))
    f = jax.jit(jax.vmap(
        lambda s: jax.lax.dynamic_slice(ref, (s,), (C,)).astype(jnp.int32)
        .sum()))
    dt = timeit(f, starts)
    print(f"vmap dyn_slice B={B} C={C}: {dt*1e3:.3f}ms -> "
          f"{B*C/dt/1e6:.1f} MB/s", flush=True)

# 3. while_loop overhead: B lanes, tiny body
for B in (256, 1024):
    x = jnp.zeros(B, jnp.int32)

    def lane(v):
        def body(st):
            i, a = st
            return i + 1, a + i
        return jax.lax.while_loop(lambda st: st[0] < 1000, body,
                                  (v, jnp.int32(0)))[1]

    f = jax.jit(jax.vmap(lane))
    dt = timeit(f, x)
    print(f"while_loop 1000 iters B={B}: {dt*1e3:.3f}ms -> "
          f"{dt/1000*1e6:.2f}us/iter", flush=True)

# 4. batched while_loop with ONE fused band-compare per iter
#    (the super-step shape: per lane load 2 contiguous 160B slices,
#     compare a 41x81 band via broadcast)
B = 512
q = jnp.asarray(np.random.randint(0, 4, (B, 4096)).astype(np.uint8))
starts = jnp.asarray(np.random.randint(0, L - 256, B).astype(np.int32))

def lane2(qrow, s0):
    def body(st):
        i, rp, acc, t = st
        qblk = jax.lax.dynamic_slice(qrow, (i,), (48,))
        rblk = jax.lax.dynamic_slice(ref, (rp,), (128,))
        band = rblk[None, 41:41+48+40] # dummy window
        eq = qblk[None, :48] == jax.lax.dynamic_slice(rblk, (0,), (88,))[
            jnp.arange(41)[:, None] + jnp.arange(48)[None, :] - 0]
        hit = jnp.argmax(eq.sum(1))
        acc = acc + eq.sum()
        return (i + 7) % 3000, (rp + 13) % (L - 256), acc, t + 1

    return jax.lax.while_loop(lambda st: st[3] < 1000, body,
                              (jnp.int32(0), s0, jnp.int32(0),
                               jnp.int32(0)))[2]

f = jax.jit(jax.vmap(lane2, in_axes=(0, 0)))
dt = timeit(f, q, starts, reps=2)
print(f"superstep-shaped loop 1000 iters B={B}: {dt*1e3:.1f}ms -> "
      f"{dt/1000*1e6:.2f}us/step; {B*1000/dt/1e3:.1f}k steps/s", flush=True)

# 5. searchsorted: L keys into sorted L array
keys = jnp.asarray(np.random.randint(0, 1 << 22, L).astype(np.int32))
srt = jnp.sort(keys)
f = jax.jit(lambda k: jnp.searchsorted(srt, k).sum())
dt = timeit(f, keys)
print(f"searchsorted L={L}: {dt*1e3:.3f}ms", flush=True)

# 6. sort L int64
k64 = jnp.asarray(np.random.randint(0, 1 << 44, L).astype(np.int64))
f = jax.jit(lambda k: jnp.sort(k))
dt = timeit(f, k64)
print(f"sort i64 L={L}: {dt*1e3:.3f}ms", flush=True)
