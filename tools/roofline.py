"""Stage-1 roofline analysis (VERDICT r2 item 6).

NOTE (round 4): ``bench.py`` now self-normalizes — it measures the
sort-only bound in-session at the EXACT production operand mix
(non-stable, invalid flag folded into the spare MSB, one packed
payload; see ``count.sort_kmers``) and emits ``fraction_of_sort_bound``
in its JSON line.  This tool's bound models a STABLE 4-operand sort,
which is looser (stage 1 can measure >1x of it); it remains useful for
the raw-sort and HBM probes only.

Stage 1 is sort-bound by design (sort + scan counting, ops/count.py).
This tool measures, at the EXACT shapes bench.py's stage 1 sorts:

  1. raw ``jax.lax.sort`` throughput for the two production sorts
     (short-k: 2 key lanes + 2 payloads; k: 2 key lanes + 2 payloads at
     the bench's position counts);
  2. a pure HBM-bandwidth probe (big-array copy) for the bandwidth
     roofline;
  3. the measured stage-1 time from the same chained-execution
     methodology as bench.py.

Output: one JSON line with stage-1 positions/s, the sort-only bound
(positions/s if ONLY the sorts ran), and the fraction of that bound the
production stage achieves -- the "is it actually fast" number the
round-2 verdict asked for.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fetch_barrier(out):
    """Completion barrier that transfers O(1) bytes: device-side slice of
    one element per leaf, then host fetch of that tiny array.  Fetching
    the full leaves (np.asarray(leaf)) moves hundreds of MB through the
    tunnel and its latency noise swamps the differenced compute time."""
    for leaf in out:
        tiny = leaf.reshape(-1)[0:1]
        np.asarray(tiny)


def _chain_time(f, args, iters=8):
    """Serialized-execution timing (bench.py methodology): feed output
    back into input, difference 1-iter vs n-iter chains."""
    import jax
    import jax.numpy as jnp

    def run_chain(n):
        x = args[0]
        t0 = time.time()
        out = None
        for _ in range(n):
            out = f(x, *args[1:])
            # serialize on first output element, value-preserving
            s = out[0].reshape(-1)[0].astype(jnp.uint32) & np.uint32(0)
            x = args[0] | s
        _fetch_barrier(out)
        return time.time() - t0

    run_chain(1)
    run_chain(1)
    t1 = min(run_chain(1) for _ in range(3))
    tn = min(run_chain(iters) for _ in range(3))
    return max((tn - t1) / (iters - 1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    # bench.py shapes: 10 Mbases in 1024-base chunks
    chunk_len, k, short_k = 1024, 25, 21
    n_chunks = 5000 * 2  # ~10M bases -> ~10.2M positions per extraction
    n_short = n_chunks * (chunk_len - short_k + 1)
    n_k = n_chunks * (chunk_len - k + 1)
    l = 2  # lanes at k=25

    rng = np.random.default_rng(0)
    print(f"# shapes: short sort N={n_short} ({l} key lanes + 2 payloads), "
          f"k sort N={n_k}", file=sys.stderr, flush=True)

    key0_s = jnp.asarray(rng.integers(0, 2**32, n_short, dtype=np.uint32))
    key1_s = jnp.asarray(rng.integers(0, 2**32, n_short, dtype=np.uint32))
    pay_s = jnp.asarray(np.arange(n_short, dtype=np.int32))
    key0_k = jnp.asarray(rng.integers(0, 2**32, n_k, dtype=np.uint32))
    key1_k = jnp.asarray(rng.integers(0, 2**32, n_k, dtype=np.uint32))
    pay_k = jnp.asarray(np.arange(n_k, dtype=np.int32))

    # --- raw sort throughput at production operand sets ---
    @jax.jit
    def sort_short(a, b, p):
        out = jax.lax.sort((a, b, p, p), num_keys=2, is_stable=True)
        return out

    @jax.jit
    def sort_k(a, b, p):
        out = jax.lax.sort((a, b, p, p), num_keys=2, is_stable=True)
        return out

    t_sort_s = _chain_time(sort_short, (key0_s, key1_s, pay_s))
    t_sort_k = _chain_time(sort_k, (key0_k, key1_k, pay_k))
    print(f"# raw sort: short {t_sort_s*1e3:.0f} ms "
          f"({n_short/t_sort_s/1e6:.0f} M rows/s), "
          f"k {t_sort_k*1e3:.0f} ms ({n_k/t_sort_k/1e6:.0f} M rows/s)",
          file=sys.stderr, flush=True)

    # --- HBM bandwidth probe (read+write of a big u32 array) ---
    big = jnp.asarray(rng.integers(0, 2**32, 256 * 2**20 // 4,
                                   dtype=np.uint32))  # 256 MiB

    @jax.jit
    def copy(x):
        return (x + np.uint32(1),)

    t_copy = _chain_time(copy, (big,))
    bw = 2 * big.size * 4 / t_copy  # bytes read + written
    print(f"# HBM probe: {bw/2**30:.0f} GiB/s effective (copy)",
          file=sys.stderr, flush=True)

    # --- production stage 1 at the same volume (bench.py program) ---
    from platanus3_tpu.io import reads as reads_mod
    from platanus3_tpu.ops import count as count_mod
    from platanus3_tpu.ops import solid as solid_mod

    genome = "".join(rng.choice(list("ACGT"), size=500_000))
    read_len, coverage = 2000, 20
    n_reads = len(genome) * coverage // read_len
    reads = []
    for _ in range(n_reads):
        s = int(rng.integers(0, len(genome) - read_len))
        reads.append(genome[s:s + read_len])
    batch = reads_mod.reads_from_strings(reads, k, chunk_len)

    def stage1(packed, valid_len, read_id, start, read_len_a):
        result, _ = solid_mod.solid_kmers(
            (packed, valid_len, read_id, start, read_len_a),
            k, short_k, 2, None, add_to_bloom=False,
            need_short_table=False)
        ll = result.canon.shape[-1]
        table, _nid = count_mod.count_solid_with_ids(
            result.canon.reshape(-1, ll),
            result.owned.reshape(-1),
            (result.is_solid & result.owned).reshape(-1), k=k)
        return (table.size, table.keys)

    f = jax.jit(stage1)
    a = [jnp.asarray(batch.packed), jnp.asarray(batch.valid_len),
         jnp.asarray(batch.read_id), jnp.asarray(batch.start),
         jnp.asarray(batch.read_len)]

    def run_chain(n):
        vlen = a[1]
        t0 = time.time()
        out = None
        for _ in range(n):
            out = f(a[0], vlen, a[2], a[3], a[4])
            s = out[0].reshape(-1)[0]
            vlen = jnp.minimum(a[1], s.astype(jnp.int32) + np.int32(2**30))
        _fetch_barrier(out)
        return time.time() - t0

    run_chain(1); run_chain(1)
    t1 = min(run_chain(1) for _ in range(2))
    t4 = min(run_chain(4) for _ in range(2))
    t_stage1 = max((t4 - t1) / 3, 1e-9)

    c = batch.num_chunks
    pos = c * (chunk_len - short_k + 1) + c * (chunk_len - k + 1)
    stage1_rate = pos / t_stage1

    # Sort-only bound: stage 1 performs (per the stage-1 program):
    #   short sort at n_short rows (count_positions_table inside
    #   solid_kmers) + k sort at n_k rows (count_solid_with_ids), at the
    #   SAME operand mix measured above.  If only those sorts ran:
    scale_s = (c * (chunk_len - short_k + 1)) / n_short
    scale_k = (c * (chunk_len - k + 1)) / n_k
    t_sort_bound = t_sort_s * scale_s + t_sort_k * scale_k
    sort_bound_rate = pos / t_sort_bound

    print(json.dumps({
        "stage1_positions_per_s": round(stage1_rate, 1),
        "sort_only_bound_positions_per_s": round(sort_bound_rate, 1),
        "fraction_of_sort_roofline": round(stage1_rate / sort_bound_rate, 3),
        "raw_sort_short_mrows_per_s": round(n_short / t_sort_s / 1e6, 1),
        "raw_sort_k_mrows_per_s": round(n_k / t_sort_k / 1e6, 1),
        "hbm_copy_gib_per_s": round(bw / 2**30, 1),
        "stage1_ms": round(t_stage1 * 1e3, 1),
        "sort_bound_ms": round(t_sort_bound * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
