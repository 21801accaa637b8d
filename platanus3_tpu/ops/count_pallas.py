"""Pallas TPU kernel: open-addressing k-mer count table.

The north-star design names an "open-addressing k-mer counting [kernel]
over HBM-resident read batches" as the alternative to the sort+segment
counter in ops/count.py (which replaces the reference's
``unordered_map<bitset,u64>``, ``src/Load.cpp:105-127``).  TPU has no
global atomics, so a straight scatter-increment table is not expressible;
this kernel restructures open addressing TPU-natively:

  1. hash every canonical k-mer to u32 (ops/hashing.py) and sort by hash
     ONLY (1-key sort; the lanes ride as payloads);
  2. aggregate ADJACENT equal k-mers vectorized (a run of an equal k-mer
     collapses to one representative carrying the run's contribution sum)
     and compact representatives to the front -- after this the kernel's
     scalar work is proportional to the number of UNIQUE k-mers, not read
     positions;
  3. partition representatives by hash prefix into blocks; a sequential
     Pallas grid gives each block an SMEM-resident open-addressing table
     (linear probing, counts==0 marks empty), merging the few same-hash
     interleaved runs step 2 cannot collapse;
  4. each block's dense (keys, counts) slab is written out once.

Mosaic constraints shape the implementation (probed on hardware): scalar
stores are SMEM-only (VMEM refuses them), and a DMA whose HBM source is
sliced crashes this toolchain -- so instead of manual chunk DMA the input
rides the BlockSpec pipeline with a scalar-prefetch-driven index map over
a rectangular ``(block, chunk-of-block)`` grid: chunk rows are
block-aligned and elements outside the block's [bounds[i], bounds[i+1])
range are masked in the kernel.

Empty-slot convention: occupancy is ``counts > 0`` -- an all-ones key
pattern is NOT usable as an empty marker because an all-ones canonical
k-mer exists (e.g. the even-k T..TA..A palindrome).

The result is a hash-ordered exact count table (`OAHashTable`).

MEASURED VERDICT (round 3, benchmarks/counter_compare.py on the v5e
chip, 4M positions / 500k unique): the sort+scan counter wins at every
lane count -- OA/sort wall ratio 3.50x at k=25, 3.33x at k=63, 2.47x at
k=127, with table equality in all cases.  Together with the stage-1
roofline (tools/roofline.py: production stage 1 runs at 0.74-0.84 of a
sort-ONLY lower bound, and TPU scatter throughput is ~2x below sort row
throughput), this retires the open-addressing counter as a production
path: it stays as a validated alternative and Mosaic reference, NOT on
the hot path.  This is the documented resolution of the round-2 verdict
item 6 ("wire it if headroom > 2x, else quantify and retire").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from platanus3_tpu.ops import hashing

__all__ = ["OAHashTable", "count_kmers_oa", "oa_to_sorted"]

# Rows per block-local table (SMEM): keys L*TB*4 B + counts TB*4 B.
TB_LOG2 = 13
TB = 1 << TB_LOG2
# Representatives per pipelined input chunk.
CH = 1 << 11
# Target load factor per block.
LOAD = 0.5
# Headroom on the per-block chunk budget (hash skew tolerance; overflow
# is detected and surfaced, never silent).
SLACK = 2.0


class OAHashTable(NamedTuple):
    """Open-addressing exact k-mer count table (hash-partitioned).

    keys:   ``[L, T] uint32`` lane-major
    counts: ``[T] int32``; slot occupied iff > 0
    overflow: scalar int32 -- dropped or uncovered inserts (0 in any
            healthy run; >0 means rebuild with more blocks / slack)
    """

    keys: jnp.ndarray
    counts: jnp.ndarray
    overflow: jnp.ndarray


jax.tree_util.register_pytree_node(
    OAHashTable,
    lambda t: ((t.keys, t.counts, t.overflow), None),
    lambda _, leaves: OAHashTable(*leaves),
)


def _insert_kernel(bounds_ref, meta_ref, lanes_ref, keys_ref, counts_ref,
                   ovf_ref, *, num_lanes: int, c_max: int):
    i, j = pl.program_id(0), pl.program_id(1)
    lo = bounds_ref[i]
    hi = bounds_ref[i + 1]
    row0 = lo // CH
    mask = np.int32(TB - 1)

    @pl.when(j == 0)
    def _():
        def z(t, _):
            counts_ref[0, 0, t] = 0
            return 0
        jax.lax.fori_loop(0, TB, z, 0)
        # Representatives past the chunk budget are never visited; count
        # them as overflow so the caller can re-shard instead of silently
        # losing k-mers.
        cover_end = (row0 + c_max) * CH
        ovf_ref[0, 0, 0] = jnp.maximum(hi - cover_end, 0)

    base = (row0 + j) * CH

    def elem_body(t, _):
        g = base + t
        contrib = meta_ref[0, 1, t]

        @pl.when((g >= lo) & (g < hi) & (contrib > 0))
        def _():
            h = meta_ref[0, 0, t]
            key = [lanes_ref[0, l, t] for l in range(num_lanes)]

            def cond(st):
                _, steps, done = st
                return jnp.logical_not(done) & (steps < TB)

            def body(st):
                slot, steps, _ = st
                empty = counts_ref[0, 0, slot] == 0
                eq = keys_ref[0, 0, slot] == key[0]
                for l in range(1, num_lanes):
                    eq = eq & (keys_ref[0, l, slot] == key[l])
                stop = empty | eq
                nslot = jnp.where(stop, slot, (slot + 1) & mask)
                return nslot, steps + 1, stop

            slot0 = h & mask
            slot, _, done = jax.lax.while_loop(
                cond, body, (slot0, jnp.int32(0), False))

            @pl.when(done)
            def _():
                for l in range(num_lanes):
                    keys_ref[0, l, slot] = lanes_ref[0, l, t]
                counts_ref[0, 0, slot] = counts_ref[0, 0, slot] + contrib

            @pl.when(jnp.logical_not(done))
            def _():
                ovf_ref[0, 0, 0] = ovf_ref[0, 0, 0] + 1

        return 0

    jax.lax.fori_loop(0, CH, elem_body, 0)


def count_kmers_oa(kmers: jnp.ndarray, contrib: jnp.ndarray, k: int,
                   interpret: bool = False) -> OAHashTable:
    """Exact counts of canonical ``[N, L]`` k-mers (open addressing).

    ``contrib [N] bool``: rows that add +1 (invalid/padding rows False).
    """
    n, l = kmers.shape
    h1, _ = hashing.double_hash(kmers, k)
    # Non-contributing rows get the max hash so they sort to the end; they
    # also carry contribution 0, so the kernel skips any that interleave
    # with real max-hash rows.
    h = jnp.where(contrib, h1, jnp.uint32(0xFFFFFFFF))
    ops = [h] + [kmers[:, j] for j in range(l)] + [
        contrib.astype(jnp.int32)]
    out = jax.lax.sort(tuple(ops), num_keys=1, is_stable=False)
    s_h, s_lanes, s_contrib = out[0], out[1 : 1 + l], out[1 + l]

    # ---- adjacent-run aggregation + compaction (vectorized) ----
    diff = s_h[1:] != s_h[:-1]
    for j in range(l):
        diff = diff | (s_lanes[j][1:] != s_lanes[j][:-1])
    is_first = jnp.concatenate([jnp.ones((1,), bool), diff])
    run_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    run_sum = jax.ops.segment_sum(s_contrib, run_id, num_segments=n)
    is_rep = is_first & (run_sum[run_id] > 0)
    rep_slot = jnp.where(is_rep,
                         jnp.cumsum(is_rep.astype(jnp.int32)) - 1, n)
    num_rep = jnp.sum(is_rep.astype(jnp.int32))

    def compact(x, fill):
        return jnp.full((n,), fill, x.dtype).at[rep_slot].set(x, mode="drop")

    c_h = compact(s_h, np.uint32(0xFFFFFFFF))
    c_lanes = [compact(s_lanes[j], np.uint32(0)) for j in range(l)]
    c_contrib = jnp.where(jnp.arange(n) < num_rep,
                          compact(run_sum[run_id], np.int32(0)), 0)

    # ---- block partition by hash prefix ----
    g_log2 = max(0, (int(n / (TB * LOAD)) - 1).bit_length())
    grid = 1 << g_log2
    if g_log2:
        blk = (c_h >> np.uint32(32 - g_log2)).astype(jnp.int32)
        bounds = jnp.searchsorted(
            blk, jnp.arange(grid + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
    else:
        bounds = jnp.stack(
            [jnp.zeros((), jnp.int32), num_rep.astype(jnp.int32)])
    # Clamp to the representative prefix (rows past num_rep are padding).
    bounds = jnp.minimum(bounds, num_rep)

    # Per-block chunk budget: expected reps/block is TB*LOAD; a block may
    # straddle chunk-row boundaries, hence the +2.
    c_max = int(np.ceil(SLACK * TB * LOAD / CH)) + 2

    # Chunk-row layout [R, ., CH] for the BlockSpec pipeline.
    rows = -(-n // CH) + c_max + 1
    pad = rows * CH - n

    def to_rows(parts, dtype):
        x = jnp.stack([jnp.concatenate(
            [p, jnp.zeros((pad,), dtype)]) for p in parts])  # [D, rows*CH]
        d = x.shape[0]
        return x.reshape(d, rows, CH).transpose(1, 0, 2)     # [rows, D, CH]

    meta = to_rows([c_h.astype(jnp.int32), c_contrib], jnp.int32)
    lanes = to_rows(c_lanes, jnp.uint32)

    def row_map(i, j, b):
        return (jnp.minimum(b[i] // CH + j, rows - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid, c_max),
        in_specs=[
            pl.BlockSpec((1, 2, CH), row_map, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, l, CH), row_map, memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, l, TB), lambda i, j, b: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TB), lambda i, j, b: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, j, b: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
    )
    keys, counts, ovf = pl.pallas_call(
        functools.partial(_insert_kernel, num_lanes=l, c_max=c_max),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((grid, l, TB), jnp.uint32),
            jax.ShapeDtypeStruct((grid, 1, TB), jnp.int32),
            jax.ShapeDtypeStruct((grid, 1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(bounds, meta, lanes)
    return OAHashTable(keys=keys.transpose(1, 0, 2).reshape(l, grid * TB),
                       counts=counts.reshape(grid * TB),
                       overflow=jnp.sum(ovf))


def oa_to_sorted(table: OAHashTable):
    """Convert to the lex-sorted `KmerTable` layout (for interop and
    equality testing against the sort-based counter)."""
    from platanus3_tpu.ops import count as count_mod
    keys = table.keys.T                      # [T, L]
    occ = table.counts > 0
    t, l = keys.shape
    s_keys, s_invalid, s_counts = count_mod.sort_kmers(
        keys, ~occ, table.counts)
    size = jnp.sum(occ.astype(jnp.int32))
    pad = jnp.full((t, l), np.uint32(0xFFFFFFFF), dtype=jnp.uint32)
    in_range = jnp.arange(t) < size
    out_keys = jnp.where(in_range[:, None], s_keys, pad)
    out_counts = jnp.where(in_range, s_counts, 0)
    return count_mod.KmerTable(keys=out_keys, counts=out_counts, size=size)
