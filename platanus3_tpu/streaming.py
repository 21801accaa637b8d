"""Streaming (bounded-memory) assembly for read sets larger than HBM.

The single-shot pipeline (pipeline.py) holds every k-mer position of the
whole read set on device at once -- ideal up to tens of millions of
bases, impossible for a human-chromosome run (BASELINE config 5).  The
streaming mode processes the chunked read batch in fixed-size SLICES of
chunks with static shapes (one compile per stage regardless of input
size), in the classic two-pass counting layout (cf. KMC/Gerbil two-pass
disk counters, PAPERS.md -- here the "disk" is host RAM and the second
pass re-extracts from packed reads):

  pass 1: per slice, count owned canonical short k-mers -> merge into a
          fixed-capacity global count table (``merge_into``);
  pass 2: per slice, per-position counts via sort-join against the global
          table -> window-min solidity -> solid node table merge + seed
          reduction (+ optional Bloom add);
  graph:  single-shot on the merged node table (graph arrays scale with
          the genome, not the read volume);
  pass 3: per slice, coverage/tally accumulation into [M]-sized arrays.

Capacities: ``short_cap`` / ``node_cap`` bound distinct short k-mers and
solid nodes (≈ genome size + error k-mers); overflow raises with the
observed size so the caller can re-run with a larger bound.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.graph import coverage as cov_mod
from platanus3_tpu.graph import reach as reach_mod
from platanus3_tpu.graph import sequence as seq_mod
from platanus3_tpu.io import gfa as gfa_mod
from platanus3_tpu.io import reads as reads_mod
from platanus3_tpu.ops import bloom as bloom_mod
from platanus3_tpu.ops import count as count_mod
from platanus3_tpu.ops import kmer as kmer_mod
from platanus3_tpu.ops import solid as solid_mod
from platanus3_tpu.ops.windowmin import window_min
from platanus3_tpu.pipeline import (AssemblyResult, _next_pow2, _stage2,
                                    _stage3)
from platanus3_tpu.utils.logging import PipelineLog

__all__ = ["assemble_streaming"]


@partial(jax.jit, static_argnames=("k", "short_k", "short_cap"))
def _count_slice(packed, valid_len, start, read_len, dst_table, ovf, *,
                 k, short_k, short_cap):
    bases = kmer_mod.unpack_bases(packed)
    c, chunk_len = bases.shape
    stride = chunk_len - k + 1
    s_canon, s_valid, s_owned = solid_mod.short_kmer_positions(
        bases, valid_len, start, read_len, stride, short_k, k)
    l = s_canon.shape[-1]
    batch_table = count_mod.count_kmers(
        s_canon.reshape(-1, l), s_owned.reshape(-1), k=short_k)
    merged = count_mod.merge_into(dst_table, batch_table, short_cap)
    # Latch overflow PER MERGE: an intermediate truncation can silently
    # drop keys whose re-entry later drifts size back under cap with
    # corrupted counts (VERDICT r1 weak #5) -- only a per-merge check
    # catches it, and the latch keeps the slice loop fully async.
    return merged, ovf | (merged.size > short_cap)


@partial(jax.jit, static_argnames=("k", "short_k", "cov_threshold",
                                   "node_cap", "num_reads", "add_to_bloom"))
def _solid_slice(packed, valid_len, read_id, start, read_len, short_table,
                 node_table, min_pos, seed_fw, bf, ovf, *,
                 k, short_k, cov_threshold, node_cap, num_reads,
                 add_to_bloom):
    bases = kmer_mod.unpack_bases(packed)
    c, chunk_len = bases.shape
    stride = chunk_len - k + 1
    p_short = chunk_len - short_k + 1
    pk = chunk_len - k + 1

    s_canon, s_valid, _ = solid_mod.short_kmer_positions(
        bases, valid_len, start, read_len, stride, short_k, k)
    ls = s_canon.shape[-1]
    per_pos = count_mod.lookup_join(
        short_table, s_canon.reshape(-1, ls)).reshape(c, p_short)

    w = k - short_k + 1
    cov_est = window_min(per_pos, w)
    fwk, valid_k = kmer_mod.extract_kmers(bases, valid_len, k)
    canon_k, _ = kmer_mod.canonical(fwk, k)
    owned_k = solid_mod.owned_mask(start, read_len, stride, pk, k, k) & valid_k
    is_solid = (cov_est >= cov_threshold) & valid_k
    solid_owned = is_solid & owned_k

    lk = canon_k.shape[-1]
    batch_nodes = count_mod.count_kmers(
        canon_k.reshape(-1, lk), solid_owned.reshape(-1), k=k)
    node_table = count_mod.merge_into(node_table, batch_nodes, node_cap)
    ovf = ovf | (node_table.size > node_cap)  # latch per merge (see above)

    if add_to_bloom:
        bf = bloom_mod.bloom_add(bf, canon_k.reshape(-1, lk), k,
                                 mask=solid_owned.reshape(-1))

    # seed reduction (first solid position per read, forward form)
    local = jnp.arange(pk, dtype=jnp.int32)[None, :]
    gpos = start[:, None] + local
    big = np.int32(2**30)
    gpos_m = jnp.where(solid_owned, gpos, big)
    flat_rid = jnp.broadcast_to(read_id[:, None], (c, pk)).reshape(-1)
    batch_min = jax.ops.segment_min(gpos_m.reshape(-1), flat_rid,
                                    num_segments=num_reads)
    new_min = jnp.minimum(min_pos, batch_min)
    is_first = solid_owned & (gpos == new_min[read_id][:, None])
    rid_b = jnp.broadcast_to(read_id[:, None], (c, pk))
    tgt = jnp.where(is_first, rid_b, num_reads).reshape(-1)
    # per-lane 1-D scatters (see ops/solid.py: [N, L] scatter updates
    # force a lane-padded row-major copy, 64x HBM at L=2)
    batch_seed = jnp.stack(
        [jnp.zeros((num_reads,), dtype=jnp.uint32).at[tgt].max(
            fwk[..., j].reshape(-1), mode="drop") for j in range(lk)],
        axis=-1)
    seed_fw = jnp.where((batch_min < min_pos)[:, None] &
                        (batch_min <= new_min)[:, None],
                        batch_seed, seed_fw)
    return node_table, seed_fw, new_min, bf, ovf


@partial(jax.jit, static_argnames=("k",))
def _cov_slice(dbg, packed, valid_len, start, read_len, prev_base,
               next_base, node_cov, jun_tally, *, k):
    bases = kmer_mod.unpack_bases(packed)
    cov = cov_mod.count_coverage(
        dbg, k, bases, valid_len, start, read_len, prev_base, next_base)
    return node_cov + cov.node_cov, jun_tally + cov.jun_tally


def _slices(total: int, step: int):
    for lo in range(0, total, step):
        yield lo, min(lo + step, total)


def assemble_streaming(source, config: AssemblyConfig,
                       log: Optional[PipelineLog] = None,
                       write_output: bool = True,
                       short_cap: int = 0, node_cap: int = 0,
                       slice_chunks: int = 2048) -> AssemblyResult:
    """Bounded-memory assembly.  ``slice_chunks`` chunks are resident per
    device step; ``short_cap``/``node_cap`` default to 4x/2x the slice
    position count (suitable when the genome is smaller than the read
    volume -- pass explicit caps for high-coverage data)."""
    log = log or PipelineLog(config.log_path, echo=False)
    t0 = time.time()

    if isinstance(source, reads_mod.ReadBatch):
        batch = source
    elif isinstance(source, (list, tuple)):
        batch = reads_mod.reads_from_strings(list(source), config.k,
                                             config.chunk_len)
    else:
        batch = reads_mod.load_reads(source, config.k, config.chunk_len)
    c_total = batch.num_chunks
    log.write(f"[streaming] {batch.num_reads} reads, {batch.all_bases} "
              f"bases, {c_total} chunks, slice={slice_chunks}")

    k = config.k
    short_k = min(config.short_k, k)
    p_short = config.chunk_len - short_k + 1
    if short_cap <= 0:
        short_cap = _next_pow2(4 * slice_chunks * p_short)
    if node_cap <= 0:
        node_cap = _next_pow2(2 * slice_chunks * p_short)

    need_bloom = (not config.use_exact_membership) or config.build_bloom
    if need_bloom:
        bits, hashes = config.auto_filter_bits(batch.all_bases)
        bf = bloom_mod.make_bloom(bits, hashes)
    else:
        bf = bloom_mod.make_bloom(8, 1)

    l_s = kmer_mod.num_lanes(short_k)
    l_k = kmer_mod.num_lanes(k)
    empty = lambda cap, l: count_mod.KmerTable(
        keys=jnp.full((cap, l), np.uint32(0xFFFFFFFF)),
        counts=jnp.zeros((cap,), jnp.int32),
        size=jnp.zeros((), jnp.int32))

    def slice_arrays(lo, hi):
        pad = slice_chunks - (hi - lo)
        def cut(a, fill=0):
            s = np.asarray(a[lo:hi])
            if pad:
                s = np.concatenate(
                    [s, np.full((pad,) + s.shape[1:], fill, s.dtype)])
            return jnp.asarray(s)
        return (cut(batch.packed), cut(batch.valid_len), cut(batch.read_id),
                cut(batch.start), cut(batch.read_len),
                cut(batch.prev_base, 4), cut(batch.next_base, 4))

    # ---- pass 1: global short-k count table ----
    short_table = empty(short_cap, l_s)
    ovf = jnp.zeros((), bool)
    for lo, hi in _slices(c_total, slice_chunks):
        packed, vlen, rid, start, rlen, _, _ = slice_arrays(lo, hi)
        short_table, ovf = _count_slice(packed, vlen, start, rlen,
                                        short_table, ovf, k=k,
                                        short_k=short_k,
                                        short_cap=short_cap)
    n_short = int(short_table.size)
    if bool(ovf):
        raise RuntimeError(
            f"short_cap {short_cap} overflow during streaming merge "
            f"(size reached > cap mid-stream; counts would be wrong); "
            f"re-run with larger short_cap")
    log.write(f"[streaming] pass1 done: {n_short} distinct short k-mers")

    # ---- pass 2: solidity, node set, seeds ----
    node_table = empty(node_cap, l_k)
    min_pos = jnp.full((batch.num_reads,), np.int32(2**30))
    seed_fw = jnp.zeros((batch.num_reads, l_k), jnp.uint32)
    ovf = jnp.zeros((), bool)
    for lo, hi in _slices(c_total, slice_chunks):
        packed, vlen, rid, start, rlen, _, _ = slice_arrays(lo, hi)
        node_table, seed_fw, min_pos, bf, ovf = _solid_slice(
            packed, vlen, rid, start, rlen, short_table, node_table,
            min_pos, seed_fw, bf, ovf, k=k, short_k=short_k,
            cov_threshold=config.cov_threshold, node_cap=node_cap,
            num_reads=batch.num_reads, add_to_bloom=need_bloom)
    num_nodes = int(node_table.size)
    if bool(ovf):
        raise RuntimeError(
            f"node_cap {node_cap} overflow during streaming merge "
            f"(size reached > cap mid-stream); re-run with larger "
            f"node_cap")
    has_seed = min_pos < np.int32(2**30)
    log.write(f"[streaming] pass2 done: {num_nodes} solid nodes")

    # ---- graph (genome-sized, single shot) ----
    cap = max(8, _next_pow2(num_nodes))
    rows = node_table.keys.shape[0]
    if cap <= rows:
        nodes = node_table.keys[:cap]
    else:
        nodes = jnp.concatenate([
            node_table.keys,
            jnp.full((cap - rows, l_k), np.uint32(0xFFFFFFFF))], axis=0)
    dbg = _stage2(nodes, jnp.asarray(num_nodes, jnp.int32), bf, k=k,
                  use_exact=config.use_exact_membership)
    log.write("[streaming] graph built")

    # ---- pass 3: coverage accumulation ----
    def accumulate_coverage(dbg):
        m = dbg.nodes.shape[0]
        node_cov = jnp.zeros((m,), jnp.int32)
        jun_tally = jnp.zeros((m, 8), jnp.int32)
        for lo, hi in _slices(c_total, slice_chunks):
            packed, vlen, rid, start, rlen, pb, nb = slice_arrays(lo, hi)
            node_cov, jun_tally = _cov_slice(
                dbg, packed, vlen, start, rlen, pb, nb, node_cov,
                jun_tally, k=k)
        return cov_mod.CoverageResult(node_cov=node_cov,
                                      jun_tally=jun_tally)

    cov = accumulate_coverage(dbg)

    # ---- simplification rounds (tips / bubbles), streaming variant ----
    # Decisions run host-side on genome-sized graph arrays; each round's
    # coverage refresh is another slice-wise pass over the reads.
    if config.clip_tips or config.pop_bubbles:
        from platanus3_tpu.graph import simplify as simp_mod
        for rnd in range(max(1, config.simplify_rounds)):
            dbg_np = jax.tree.map(np.asarray, dbg)
            keep, n_drop = simp_mod.decide_drops(
                dbg_np, np.asarray(cov.node_cov), config)
            if keep is None:
                break
            kept_keys = np.asarray(dbg_np.nodes)[keep]
            n_keep = kept_keys.shape[0]
            cap2 = max(8, _next_pow2(n_keep))
            padk = np.full((cap2 - n_keep, kept_keys.shape[1]),
                           np.uint32(0xFFFFFFFF))
            nodes = jnp.asarray(np.concatenate([kept_keys, padk]))
            dbg = _stage2(nodes, jnp.asarray(n_keep, jnp.int32), bf, k=k,
                          use_exact=True)
            cov = accumulate_coverage(dbg)
            log.write(f"[streaming] simplify round {rnd + 1}: dropped "
                      f"{n_drop} unitigs, {n_keep} nodes left")
        num_nodes = int(dbg.size)

    reach_jun, reach_uni = reach_mod.reachable(dbg, seed_fw, has_seed, k)
    chars = seq_mod.member_chars(dbg, k)
    if not config.restrict_to_seeds:
        reach_jun = jnp.ones_like(reach_jun)
        reach_uni = jnp.ones_like(reach_uni)
    log.write("[streaming] coverage done")

    # ---- host output (compact device packs) ----
    from platanus3_tpu.pipeline import _emit_output
    seqs, lines = _emit_output(dbg, cov, reach_jun, reach_uni, chars, k)
    if write_output:
        with open(config.gfa_path, "w") as f:
            f.write("\n".join(lines) + "\n")
    n_s = sum(1 for ln in lines if ln.startswith("S\tStraight"))
    n_j = sum(1 for ln in lines if ln.startswith("S\tJunction"))
    log.write(f"[streaming] finish ({time.time() - t0:.2f}s, {n_s} "
              f"straights, {n_j} junctions)")
    return AssemblyResult(
        gfa_lines=lines, straight_seqs=seqs, dbg=dbg, cov=cov,
        reach_jun=reach_jun, reach_uni=reach_uni, num_nodes=num_nodes,
        num_junctions=n_j, num_straights=n_s,
        stats={"elapsed_s": time.time() - t0,
               "all_bases": batch.all_bases,
               "num_reads": batch.num_reads, "solid_nodes": num_nodes})
