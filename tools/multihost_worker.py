"""One process of a multi-process (multi-host) sharded stage-1 run.

Usage (one invocation per process, same coordinator port):

    python tools/multihost_worker.py --pid 0 --nprocs 2 --port 12321 \
        --fasta reads.fasta --out out0.npz [--devices-per-proc 4]

Each process registers with ``jax.distributed`` (the real-pod layer
``parallel/multihost.py`` wraps), joins a global mesh spanning every
process's devices, loads the SAME read file, and runs the hash-prefix
sharded stage 1 (``parallel/sharded.py``) -- all-to-all k-mer routing and
the allreduce-OR Bloom merge now cross PROCESS boundaries, exactly the
BASELINE config-5 topology (chips stand in for hosts).  The replicated
results are saved for equality checking against a single-process run
(tests/test_multihost.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--fasta", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=25)
    ap.add_argument("--chunk-len", type=int, default=512)
    ap.add_argument("--full", action="store_true",
                    help="run the FULL pipeline (graph + coverage + GFA "
                         "emission) instead of stage 1 only")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from platanus3_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"localhost:{args.port}",
                         num_processes=args.nprocs, process_id=args.pid)
    assert jax.process_count() == args.nprocs, jax.process_count()

    import numpy as np
    from platanus3_tpu.io import reads as reads_mod
    from platanus3_tpu.ops import bloom as bloom_mod
    from platanus3_tpu.parallel import sharded

    mesh = multihost.global_mesh()

    if args.full:
        # ---- FULL pipeline under jax.distributed (VERDICT r2 item 8):
        # sharded stage 1 -> replicated graph/coverage/emission, ending in
        # actual GFA lines; gather_to_host0 carries each process's line
        # digest so host 0 verifies cross-process agreement.
        import hashlib
        from platanus3_tpu.config import AssemblyConfig
        from platanus3_tpu.pipeline import assemble

        cfg = AssemblyConfig(k=args.k, chunk_len=args.chunk_len,
                             log_path=None)
        res = assemble(args.fasta, cfg, write_output=False, mesh=mesh)
        blob = "\n".join(sorted(res.gfa_lines)).encode()
        dig = np.frombuffer(hashlib.sha256(blob).digest(), np.uint8)
        all_digs = multihost.gather_to_host0(dig)  # [nprocs*32] u8
        if jax.process_index() == 0:
            per = all_digs.reshape(jax.process_count(), 32)
            assert (per == per[0]).all(), \
                "GFA digests differ across processes"
        np.savez(args.out,
                 gfa=np.frombuffer(blob, np.uint8),
                 digest=dig, all_digests=np.asarray(all_digs),
                 num_nodes=res.num_nodes,
                 num_straights=res.num_straights,
                 num_junctions=res.num_junctions,
                 nprocs=jax.process_count(),
                 ndevices=len(jax.devices()))
        print(f"[worker {args.pid}] full ok: {res.num_nodes} nodes, "
              f"{res.num_straights} straights, {res.num_junctions} "
              f"junctions, {len(res.gfa_lines)} GFA lines", flush=True)
        return
    batch = reads_mod.load_reads(args.fasta, args.k, args.chunk_len)
    arrays = sharded.pad_batch_to_devices(
        (batch.packed, batch.valid_len, batch.read_id, batch.start,
         batch.read_len), mesh.devices.size)
    bf = bloom_mod.make_bloom(1 << 16, 4)
    table, bf2, seed_fw, has_seed, ovf = sharded.sharded_stage1(
        mesh, *arrays, bf, k=args.k, short_k=min(21, args.k),
        cov_threshold=2, num_reads=batch.num_reads, add_to_bloom=True)

    # Replicated outputs: every process holds full copies; the "stitch on
    # host 0" step is a local read (gather_to_host0 is the general form).
    size = int(table.size)
    np.savez(args.out,
             keys=np.asarray(jax.device_get(table.keys))[:size],
             counts=np.asarray(jax.device_get(table.counts))[:size],
             size=size,
             bloom_bits=np.asarray(jax.device_get(bf2.bits)),
             seed_fw=np.asarray(jax.device_get(seed_fw)),
             has_seed=np.asarray(jax.device_get(has_seed)),
             ovf=int(ovf),
             nprocs=jax.process_count(),
             ndevices=len(jax.devices()))
    print(f"[worker {args.pid}] ok: {size} nodes, "
          f"{len(jax.devices())} global devices, "
          f"{jax.process_count()} processes", flush=True)


if __name__ == "__main__":
    main()
