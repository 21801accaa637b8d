"""Benchmark: canonical k-mers/sec/chip through the count+Bloom hot path.

BASELINE metric: "k-mers/sec/chip (count+Bloom)".  The reference's
measured throughput is ~1.9e5 canonical-k-mer ops/s end-to-end on 2 CPU
cores (BASELINE.md); ``vs_baseline`` is the ratio against that.

Prints exactly one JSON line.  Runs on whatever the default JAX backend
is (TPU under the driver; CPU elsewhere).
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
    from platanus3_tpu.config import AssemblyConfig
    from platanus3_tpu.io import reads as reads_mod
    from platanus3_tpu.ops import bloom as bloom_mod
    from platanus3_tpu.ops import count as count_mod
    from platanus3_tpu.ops import solid as solid_mod

    k, short_k, cov_threshold = 25, 21, 2
    chunk_len = 1024

    # ~10M bases of synthetic 20x reads over a 500 kb genome.
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=500_000))
    read_len, coverage = 2000, 20
    n_reads = len(genome) * coverage // read_len
    reads = []
    for _ in range(n_reads):
        s = int(rng.integers(0, len(genome) - read_len))
        reads.append(genome[s : s + read_len])
    batch = reads_mod.reads_from_strings(reads, k, chunk_len)

    bits, hashes = AssemblyConfig(k=k).auto_filter_bits(batch.all_bases)
    bf = bloom_mod.make_bloom(bits, hashes)

    from functools import partial

    @partial(jax.jit, static_argnames=())
    def stage1(packed, valid_len, read_id, start, read_len_a, bits_in):
        bf_in = bloom_mod.BloomFilter(bits_in, bf.log2_bits, bf.num_hashes)
        result, bf_out = solid_mod.solid_kmers(
            (packed, valid_len, read_id, start, read_len_a),
            k, short_k, cov_threshold, bf_in)
        l = result.canon.shape[-1]
        table = count_mod.count_kmers(
            result.canon.reshape(-1, l),
            (result.is_solid & result.owned).reshape(-1))
        return table.size, bf_out.bits

    args = (
        jnp.asarray(batch.packed), jnp.asarray(batch.valid_len),
        jnp.asarray(batch.read_id), jnp.asarray(batch.start),
        jnp.asarray(batch.read_len), bf.bits,
    )

    # Warmup / compile.  NOTE: on the tunneled TPU backend
    # block_until_ready can return before execution completes; a host
    # fetch is the only reliable completion barrier, so timing uses
    # chained executions (bits feed forward -> serialized) and differences
    # out the round-trip latency.
    def run_chain(n_iters):
        bits_in = args[-1]
        t0 = time.time()
        for _ in range(n_iters):
            size, bits_in = stage1(*args[:-1], bits_in)
        _ = int(size)  # host fetch forces completion of the whole chain
        return time.time() - t0

    run_chain(1)  # compile + backend warmup
    run_chain(1)  # first-fetch warmup
    t1 = min(run_chain(1) for _ in range(2))
    t4 = min(run_chain(4) for _ in range(2))
    dt = max((t4 - t1) / 3, 1e-9)

    c = batch.num_chunks
    kmer_positions = c * (chunk_len - short_k + 1) + c * (chunk_len - k + 1)
    value = kmer_positions / dt
    baseline = 1.9e5  # reference: canonical-kmer ops/s, 2 CPU cores
    print(json.dumps({
        "metric": "kmers_per_sec_per_chip_count_bloom",
        "value": round(value, 1),
        "unit": "canonical kmers/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
