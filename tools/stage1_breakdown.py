"""Per-substep wall-clock breakdown of production stage 1 on the bench
workload (VERDICT r1 item 5: reconcile the bench + find the real
bottleneck before redesigning the counter)."""

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
from functools import partial

from platanus3_tpu.io import reads as reads_mod
from platanus3_tpu.ops import count as count_mod
from platanus3_tpu.ops import kmer as kmer_mod
from platanus3_tpu.ops import solid as solid_mod
from platanus3_tpu.ops.windowmin import window_min

print("devices:", jax.devices(), flush=True)

k, short_k, cov_threshold = 25, 21, 2
chunk_len = 1024

rng = np.random.default_rng(0)
genome = "".join(rng.choice(list("ACGT"), size=500_000))
read_len, coverage = 2000, 20
n_reads = len(genome) * coverage // read_len
reads = [genome[int(s):int(s) + read_len]
         for s in rng.integers(0, len(genome) - read_len, size=n_reads)]
batch = reads_mod.reads_from_strings(reads, k, chunk_len)
print(f"bases={batch.all_bases} chunks={batch.num_chunks}", flush=True)

packed = jnp.asarray(batch.packed)
valid_len = jnp.asarray(batch.valid_len)
read_id = jnp.asarray(batch.read_id)
start = jnp.asarray(batch.start)
rlen = jnp.asarray(batch.read_len)
stride = chunk_len - k + 1


def timed(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[:1]
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.1f} ms", flush=True)
    return out


@jax.jit
def extract_short(packed, valid_len, start, rlen):
    bases = kmer_mod.unpack_bases(packed)
    return solid_mod.short_kmer_positions(
        bases, valid_len, start, rlen, stride, short_k, k)


s_canon, s_valid, s_owned = timed("extract+canon short", extract_short,
                                  packed, valid_len, start, rlen)
ls = s_canon.shape[-1]
flat_c = s_canon.reshape(-1, ls)
flat_v = s_valid.reshape(-1)
flat_o = s_owned.reshape(-1)
n = flat_c.shape[0]
print(f"short positions N = {n/1e6:.1f} M", flush=True)


@jax.jit
def just_sort(c, v, o):
    idx = jnp.arange(n, dtype=jnp.uint32)
    idx_packed = idx | jnp.where(o & v, np.uint32(0x80000000), np.uint32(0))
    return count_mod.sort_kmers(c, ~v, idx_packed, k=short_k)


s_sorted = timed("  short: sort only", just_sort, flat_c, flat_v, flat_o)


@jax.jit
def cpt(c, v, o):
    return count_mod.count_positions_table(c, v, o, k=short_k)


(short_table, per_pos) = timed("short count_positions_table", cpt,
                               flat_c, flat_v, flat_o)
per_pos2 = per_pos.reshape(s_canon.shape[0], -1)


@jax.jit
def wmin(pp):
    return window_min(pp, k - short_k + 1)


cov_est = timed("window_min", wmin, per_pos2)


@jax.jit
def extract_large(packed, valid_len, start, rlen):
    bases = kmer_mod.unpack_bases(packed)
    fw, valid_k = kmer_mod.extract_kmers(bases, valid_len, k)
    canon, _ = kmer_mod.canonical(fw, k)
    owned_k = solid_mod.owned_mask(start, rlen, stride,
                                   fw.shape[1], k, k) & valid_k
    return canon, fw, valid_k, owned_k


canon, fw, valid_k, owned_k = timed("extract+canon large", extract_large,
                                    packed, valid_len, start, rlen)
lk = canon.shape[-1]
is_solid = (cov_est >= cov_threshold) & valid_k


@jax.jit
def csi(c, o, s):
    return count_mod.count_solid_with_ids(
        c.reshape(-1, lk), o.reshape(-1), (s & o).reshape(-1), k=k)


table, nid = timed("large count_solid_with_ids", csi, canon, owned_k,
                   is_solid)


@jax.jit
def seeds(sr_canon, sr_fw, sr_solid, sr_owned, read_id, start):
    res = solid_mod.SolidResult(canon=sr_canon, fw=sr_fw, is_solid=sr_solid,
                                owned=sr_owned, short_table=None,
                                cov_est=None)
    return solid_mod.first_solid_per_read(res, read_id, start,
                                          batch.num_reads)


timed("first_solid_per_read (seeds)", seeds, canon, fw, is_solid, owned_k,
      read_id, start)

# full stage-1 for reference
from platanus3_tpu.ops import bloom as bloom_mod
from platanus3_tpu.pipeline import _stage1

bf = bloom_mod.make_bloom(8, 1)
timed("FULL _stage1 (production)", partial(
    _stage1, k=k, short_k=short_k, num_reads=batch.num_reads,
    add_to_bloom=False), packed, valid_len, read_id, start, rlen, bf,
    jnp.asarray(cov_threshold, jnp.int32))
