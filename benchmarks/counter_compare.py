"""Sort-based vs open-addressing (Pallas) k-mer counting, on device.

Measures the two exact counters in ops/count.py and ops/count_pallas.py
over the same canonical k-mer batch at several k (lane counts), printing
wall-clock per pass and the agreement of the resulting tables.

Run on TPU:   python benchmarks/counter_compare.py [--n 20000000] [--k 25]
Run on CPU:   env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python ... --interpret
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000,
                    help="number of k-mer positions")
    ap.add_argument("--uniq", type=int, default=0,
                    help="unique k-mers (default n//8)")
    ap.add_argument("--k", type=str, default="25,63,127")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from platanus3_tpu.utils.backend import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp
    from platanus3_tpu.ops import count as C
    from platanus3_tpu.ops import count_pallas as OA
    from platanus3_tpu.ops import kmer as K

    rng = np.random.default_rng(0)
    results = []
    for k in [int(x) for x in args.k.split(",")]:
        l = (k + 15) // 16
        uniq = args.uniq or max(64, args.n // 8)
        # Random unique canonical k-mers, sampled with skewed multiplicity.
        base = rng.integers(0, 2**32, size=(uniq, l), dtype=np.uint64
                            ).astype(np.uint32)
        # Clear invalid high bits of the last lane; canonicalize.
        picks = rng.integers(0, uniq, size=args.n)
        raw = jnp.asarray(base[picks])
        mask_bits = (2 * k) % 32
        if mask_bits:
            m = np.uint32((1 << mask_bits) - 1)
            raw = raw.at[:, 0].set(raw[:, 0] & m)
        canon, _ = K.canonical(raw, k)
        contrib = jnp.ones((args.n,), bool)

        sort_fn = jax.jit(lambda km, cb: C.count_kmers(km, cb))
        oa_fn = jax.jit(lambda km, cb: OA.count_kmers_oa(
            km, cb, k, interpret=args.interpret), static_argnames=())

        def timed(fn, fetch):
            fn(canon, contrib)  # compile + warm
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(canon, contrib)
            fetch(out)
            return (time.time() - t0) / args.iters

        t_sort = timed(sort_fn, lambda o: int(o.size))
        t_oa = timed(oa_fn, lambda o: int(o.overflow))

        tab_sort = sort_fn(canon, contrib)
        tab_oa = OA.oa_to_sorted(oa_fn(canon, contrib))
        sz = int(tab_sort.size)
        agree = (int(tab_oa.size) == sz and
                 bool(jnp.all(tab_oa.keys[:sz] == tab_sort.keys[:sz])) and
                 bool(jnp.all(tab_oa.counts[:sz] == tab_sort.counts[:sz])))
        row = {"k": k, "lanes": l, "n": args.n, "unique": sz,
               "sort_s": round(t_sort, 4), "oa_s": round(t_oa, 4),
               "oa_over_sort": round(t_oa / t_sort, 3), "equal": agree}
        results.append(row)
        print(row, flush=True)
    print(json.dumps({"config": "counter-compare", "rows": results}))


if __name__ == "__main__":
    main()
