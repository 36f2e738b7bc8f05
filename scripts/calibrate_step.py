"""Calibrate TPU cost of one event-driven super-step under vmap.

Synthetic loop: B lanes, each iteration does the shape of work one
super-step needs — a 41-wide window gather from a shared ref buffer,
a 41x32 byte comparison block, argmax reductions, and a state update.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1400
W, C = 41, 32  # window positions x compare chunk

L = 131072
ref = jnp.asarray(np.random.randint(0, 4, L).astype(np.uint8))
qs = jnp.asarray(np.random.randint(0, 4, (B, 4096)).astype(np.uint8))


def one_lane(q):
    def body(st):
        i, acc, t = st
        # 41 candidate positions, each comparing a 32-byte block
        starts = (i + jnp.arange(W)) % (L - C)
        refblk = ref[starts[:, None] + jnp.arange(C)[None, :]]   # (W, C)
        qblk = jax.lax.dynamic_slice(q, (i % 4000,), (C,))        # (C,)
        eq = refblk == qblk[None, :]
        lens = jnp.argmin(eq, axis=1)                             # (W,)
        best = jnp.argmax(lens)
        acc = acc + lens[best]
        i = (i + lens[best] + 1) % 4000
        return i, acc, t + 1

    i, acc, t = jax.lax.while_loop(lambda st: st[2] < STEPS, body,
                                   (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    return acc


run = jax.jit(jax.vmap(one_lane))
out = run(qs)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = run(qs)
jax.block_until_ready(out)
dt = time.perf_counter() - t0
print(f"B={B} steps={STEPS}: {dt*1e3:.1f}ms total, "
      f"{dt/STEPS*1e6:.2f}us/step, "
      f"-> {B/(dt):.0f} lane-chains/s", flush=True)
