"""Primitive-throughput microbenchmarks on the real TPU chip.

Grounds the stage-1 counter redesign (VERDICT.md item 1): measures
lax.sort, scatter, gather, cumsum rates so the replacement for the
global-sort counter is designed against real numbers, not guesses.

Timing: warmup, then time ITERS chained executions ending in a tiny host
fetch of every output leaf; report best of 3 trials.  No differencing --
dispatch overhead is amortized over ITERS.
"""

import os
import sys
import time
import numpy as np


def _ensure_backend():
    import jax
    try:
        jax.devices()
        return
    except RuntimeError:
        tries = int(os.environ.get("P3_BENCH_RETRY", "0"))
        if tries >= 12:
            raise
        os.environ["P3_BENCH_RETRY"] = str(tries + 1)
        time.sleep(30)
        os.execv(sys.executable, [sys.executable] + sys.argv)


import jax
_ensure_backend()
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

N = 1 << 23          # 8.4M elements
TBITS = 23
ITERS = 8


def timed(fn, args, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*out) if isinstance(out, tuple) else fn(out)
    jax.block_until_ready(out)

    best = 1e9
    for _ in range(3):
        cur = args
        t0 = time.time()
        for _ in range(ITERS):
            cur = fn(*cur) if isinstance(cur, tuple) else fn(cur)
            if not isinstance(cur, tuple):
                cur = (cur,)
        for leaf in jax.tree.leaves(cur):
            np.asarray(leaf[:1])
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{name:44s} {best*1e3:9.2f} ms  {N/best/1e6:9.1f} M elem/s",
          flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    lane1 = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, 1 << TBITS, size=N, dtype=np.int32))
    idx_small = jnp.asarray(rng.integers(0, 1 << 16, size=N, dtype=np.int32))
    table = jnp.zeros((1 << TBITS,), jnp.int32)
    tsmall = jnp.zeros((1 << 16,), jnp.int32)
    tableu = jnp.zeros((1 << TBITS,), jnp.uint32)
    vals = jnp.asarray(rng.integers(0, 2**31, size=N, dtype=np.int32))

    jit = jax.jit

    timed(jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)),
          (keys, lane1), "sort 1key u32 + 1 payload")
    timed(jit(lambda k, l, p: jax.lax.sort((k, l, p), num_keys=2)),
          (keys, lane1, idx), "sort 2key + 1 payload")
    timed(jit(lambda k, l, p, q: jax.lax.sort((k, l, p, q), num_keys=2,
                                              is_stable=True)),
          (keys, lane1, idx, lane1), "sort 2key + 2 payload (stable)")
    timed(jit(lambda k, l, m, p: jax.lax.sort((k, l, m, p), num_keys=3,
                                              is_stable=True)),
          (keys, lane1, lane1, idx), "sort 3key + 1 payload (stable)")
    timed(jit(lambda t, i: (t.at[i].add(1), (i + 1) & ((1 << TBITS) - 1))),
          (table, idx), f"scatter-add int32 N->2^{TBITS}")
    timed(jit(lambda t, i: (t.at[i].add(1), (i + 1) & ((1 << 16) - 1))),
          (tsmall, idx_small), "scatter-add int32 N->2^16")
    timed(jit(lambda t, i, v: (t.at[i].set(v), (i + 1) & ((1 << TBITS) - 1),
                               v)),
          (tableu, idx, keys), f"scatter-set u32 N->2^{TBITS}")
    timed(jit(lambda t, i: (t, (t[i] + i) & ((1 << TBITS) - 1))),
          (table, idx), f"gather int32 N<-2^{TBITS}")
    timed(jit(lambda t, i: (t, (t[i] + i) & ((1 << 16) - 1))),
          (tsmall, idx_small), "gather int32 N<-2^16")
    timed(jit(lambda v: jnp.cumsum(v)), (vals,), "cumsum int32 N")
    timed(jit(lambda a, b: ((a * np.uint32(0x9E3779B9)) ^ (b >> 7),
                            b + np.uint32(1))),
          (keys, lane1), "elementwise mul/xor (VPU baseline)")


if __name__ == "__main__":
    main()
