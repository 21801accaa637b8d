"""Counting scaling-efficiency harness (BASELINE scaling gate).

Measures sharded stage-1 throughput at 1, 2, 4, ... devices over whatever
mesh is available and reports weak-scaling efficiency of the k-mer
counting path (extract -> all-to-all shuffle -> sort-count -> solidity).

On a real pod slice, run one process per host (parallel/multihost.py)
and this script measures the true >80%-efficiency gate.  On the CI
container it runs on virtual CPU devices, which validates the MECHANICS
(the collective program compiles and the work partitions) but not
hardware speedup -- virtual devices share the same cores.  It prints one
JSON line per device count.

Usage:  python benchmarks/scaling.py [--bases 10000000]
"""

import argparse
import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", type=int, default=4_000_000)
    ap.add_argument("--cpu", action="store_true",
                    help="force 8 virtual CPU devices")
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from platanus3_tpu.io import reads as reads_mod
    from platanus3_tpu.ops import bloom as bloom_mod
    from platanus3_tpu.parallel import sharded

    k, short_k, chunk_len = 25, 21, 1024
    rng = np.random.default_rng(0)
    glen = max(100_000, args.bases // 20)
    genome = "".join(rng.choice(list("ACGT"), size=glen))
    reads = []
    total = 0
    while total < args.bases:
        s = int(rng.integers(0, glen - 2000))
        reads.append(genome[s : s + 2000])
        total += 2000
    batch = reads_mod.reads_from_strings(reads, k, chunk_len)
    bf = bloom_mod.make_bloom(8, 1)

    devs = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    base_rate = None
    for n in counts:
        mesh = sharded.make_mesh(devs[:n])
        arrays = sharded.pad_batch_to_devices(
            (batch.packed, batch.valid_len, batch.read_id, batch.start,
             batch.read_len), n)

        def run():
            t0 = time.time()
            table, _, seed, has, ovf = sharded.sharded_stage1(
                mesh, *arrays, bf, k=k, short_k=short_k, cov_threshold=2,
                num_reads=batch.num_reads, add_to_bloom=False)
            _ = int(table.size) + int(ovf)  # completion barrier
            return time.time() - t0

        run()                      # compile
        dt = min(run() for _ in range(2))
        rate = batch.all_bases / dt
        if base_rate is None:
            base_rate = rate
        print(json.dumps({
            "devices": n,
            "bases_per_s": round(rate),
            "seconds": round(dt, 3),
            "efficiency_vs_1dev": round(rate / (base_rate * n), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
