"""Per-component wall-clock of the stage-1 hot path on the real chip.

Times cumulative prefixes of the stage-1 computation (each prefix jitted
separately, chained executions + host-fetch barrier as in bench.py) so
the difference between consecutive rows is the cost of the added
component.  Grounds VERDICT item 5 (reconcile bench numbers) and the
counter redesign (VERDICT item 1).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

from platanus3_tpu.io import reads as reads_mod
from platanus3_tpu.ops import bloom as bloom_mod
from platanus3_tpu.ops import count as count_mod
from platanus3_tpu.ops import kmer as kmer_mod
from platanus3_tpu.ops import solid as solid_mod
from platanus3_tpu.ops.windowmin import window_min

k, short_k, cov_threshold = 25, 21, 2
chunk_len = 1024

rng = np.random.default_rng(0)
genome = "".join(rng.choice(list("ACGT"), size=500_000))
read_len, coverage = 2000, 20
n_reads = len(genome) * coverage // read_len
reads = []
for _ in range(n_reads):
    s = int(rng.integers(0, len(genome) - read_len))
    reads.append(genome[s : s + read_len])
batch = reads_mod.reads_from_strings(reads, k, chunk_len)
num_reads = batch.num_reads

args = [jnp.asarray(batch.packed), jnp.asarray(batch.valid_len),
        jnp.asarray(batch.read_id), jnp.asarray(batch.start),
        jnp.asarray(batch.read_len)]
stride = chunk_len - k + 1


def stage_extract(packed, valid_len, read_id, start, read_len_a):
    bases = kmer_mod.unpack_bases(packed)
    s_canon, s_valid, s_owned = solid_mod.short_kmer_positions(
        bases, valid_len, start, read_len_a, stride, short_k, k)
    fw, valid_k = kmer_mod.extract_kmers(bases, valid_len, k)
    canon, _ = kmer_mod.canonical(fw, k)
    pk = fw.shape[1]
    owned_k = solid_mod.owned_mask(start, read_len_a, stride, pk, k, k) & valid_k
    return s_canon, s_valid, s_owned, fw, canon, valid_k, owned_k


def stage_shortcount(*a):
    s_canon, s_valid, s_owned, fw, canon, valid_k, owned_k = stage_extract(*a)
    l_s = s_canon.shape[-1]
    short_table, per_pos = count_mod.count_positions_table(
        s_canon.reshape(-1, l_s), s_valid.reshape(-1),
        s_owned.reshape(-1), k=short_k)
    return per_pos, short_table.size, canon, valid_k, owned_k, fw


def stage_windowmin(*a):
    per_pos, ssize, canon, valid_k, owned_k, fw = stage_shortcount(*a)
    c = canon.shape[0]
    short_counts = per_pos.reshape(c, -1)
    cov_est = window_min(short_counts, k - short_k + 1)
    is_solid = (cov_est >= cov_threshold) & valid_k
    return is_solid, ssize, canon, owned_k, fw


def stage_nodesort(*a):
    # Main node sort + run scans only (no nid back-sort, no compaction):
    # isolates the irreducible leg of count_solid_with_ids.
    is_solid, ssize, canon, owned_k, fw = stage_windowmin(*a)
    l = canon.shape[-1]
    _, per_pos = count_mod.count_positions_table(
        canon.reshape(-1, l), owned_k.reshape(-1),
        (is_solid & owned_k).reshape(-1), k=k, want_table=False)
    return per_pos, ssize, is_solid, owned_k, fw


def stage_nodetable(*a):
    is_solid, ssize, canon, owned_k, fw = stage_windowmin(*a)
    l = canon.shape[-1]
    table, nid = count_mod.count_solid_with_ids(
        canon.reshape(-1, l), owned_k.reshape(-1),
        (is_solid & owned_k).reshape(-1), k=k, want_counts=False)
    return table.size, table.keys, ssize, is_solid, owned_k, fw


def stage_seeds(*a):
    tsize, keys, ssize, is_solid, owned_k, fw = stage_nodetable(*a)
    res = solid_mod.SolidResult(
        canon=fw, fw=fw, is_solid=is_solid, owned=owned_k,
        short_table=None, cov_est=None)
    seed_fw, has_seed = solid_mod.first_solid_per_read(
        res, args[2], args[3], num_reads)
    return tsize, keys, ssize, jnp.sum(has_seed), seed_fw


def timed(fn, name):
    f = jax.jit(fn)

    def chain(n):
        vlen = args[1]
        t0 = time.time()
        out = None
        for _ in range(n):
            out = f(args[0], vlen, args[2], args[3], args[4])
            first = out[0]
            scalar = first if first.ndim == 0 else first.reshape(-1)[0]
            vlen = jnp.minimum(args[1],
                               scalar.astype(jnp.int32) + np.int32(2**30))
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf).reshape(-1)[:1]
        return time.time() - t0

    chain(1); chain(1)
    t1 = min(chain(1) for _ in range(2))
    t4 = min(chain(4) for _ in range(2))
    dt = max((t4 - t1) / 3, 1e-9)
    print(f"{name:28s} {dt*1e3:9.1f} ms", flush=True)
    return dt


c = batch.num_chunks
pos = c * (chunk_len - short_k + 1) + c * (chunk_len - k + 1)
print(f"chunks={c} kmer_positions={pos}", flush=True)
t_e = timed(stage_extract, "extract+canon")
t_s = timed(stage_shortcount, "+ short count")
t_w = timed(stage_windowmin, "+ window-min")
t_ns = timed(stage_nodesort, "+ node sort+scan only")
t_n = timed(stage_nodetable, "+ node table (nid+compact)")
t_x = timed(stage_seeds, "+ seeds (full stage1)")
print(f"\ndeltas: short_count={t_s-t_e:.3f}s windowmin={t_w-t_s:.3f}s "
      f"node_main_sort={t_ns-t_w:.3f}s nid_backsort+compaction="
      f"{t_n-t_ns:.3f}s seeds={t_x-t_n:.3f}s")
print(f"total {t_x:.3f}s -> {pos/t_x/1e6:.1f} M kmers/s")
