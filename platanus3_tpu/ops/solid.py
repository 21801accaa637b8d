"""Solid-k-mer selection: short-k counting -> window-min -> solidity mask,
Bloom construction and seed k-mers.

Array-native re-design of stages A+B of the reference pipeline
(``ReadFile::CountShortKmer`` at ``src/Load.cpp:105-127`` and ``MakeBF`` at
``src/MakeBloomFilter.cpp:24-89``):

  1. every chunk's canonical short k-mers are counted exactly in one global
     sort (ops/count.py); chunk-overlap copies are "phantoms" that receive
     counts without contributing;
  2. a windowed min of width ``k - short_k + 1`` turns per-position short
     counts into a conservative coverage estimate per large k-mer
     (the reference's ``RMQ`` call, ``src/MakeBloomFilter.cpp:62``);
  3. large k-mers with window-min >= cov_threshold are "solid": their
     canonical forms enter the Bloom filter (``src/MakeBloomFilter.cpp:
     75-77``) and the exact solid set is ALSO returned (a capability the
     reference does not have -- it only keeps the lossy filter);
  4. the first solid large k-mer of each read is a traversal seed, kept in
     its FORWARD orientation (``src/MakeBloomFilter.cpp:79-83``).

Chunk geometry (io/reads.py): chunk owns local large positions
``[0, stride)`` and local short positions ``[0, stride)``; the window for
an owned large position only touches short positions inside the same chunk
(guaranteed by ``chunk_len >= 2k``).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from platanus3_tpu.ops import bloom as bloom_mod
from platanus3_tpu.ops import count as count_mod
from platanus3_tpu.ops import kmer as kmer_mod
from platanus3_tpu.ops.windowmin import window_min

__all__ = ["SolidResult", "short_kmer_positions", "solid_kmers",
           "owned_mask", "first_solid_per_read"]


class SolidResult(NamedTuple):
    """Outputs of the solidity stage (all per-chunk, static shapes).

    canon:      ``[C, Pk, L] uint32``  canonical large k-mer per position
    fw:         ``[C, Pk, L] uint32``  forward-orientation large k-mer
    is_solid:   ``[C, Pk] bool``       window-min >= threshold and in-read
    owned:      ``[C, Pk] bool``       position owned by this chunk (each
                                       global read position owned once)
    short_table: KmerTable of exact canonical short-k counts
    cov_est:    ``[C, Pk] int32``      window-min coverage estimate per
                                       position (threshold-independent; lets
                                       a threshold sweep reuse one stage-1
                                       pass, BASELINE config 2)
    """

    canon: jnp.ndarray
    fw: jnp.ndarray
    is_solid: jnp.ndarray
    owned: jnp.ndarray
    short_table: count_mod.KmerTable
    cov_est: jnp.ndarray


def owned_mask(start, read_len, stride, p, kk, k):
    """[C, p] bool: chunk-local position owned by this chunk.

    A position (global start ``g = start + local``) for k-mer length ``kk``
    is owned by chunk ``i`` when ``local < stride`` -- except that for
    ``kk < k`` the read's LAST chunk also owns the tail positions
    ``local in [stride, stride + k - kk)`` which no later chunk exists to
    own (the chunking stride is built for the large k; short k-mers extend
    ``k - kk`` positions further right).
    """
    local = jnp.arange(p, dtype=jnp.int32)[None, :]
    in_read = start[:, None] + local + kk <= read_len[:, None]
    owned = local < stride
    if kk < k:
        is_last = (start + stride)[:, None] > (read_len - k)[:, None]
        owned = owned | is_last
    return owned & in_read


def short_kmer_positions(bases, valid_len, start, read_len, stride,
                         short_k: int, k: int):
    """Canonical short k-mers + (valid, owned) masks for every chunk-local
    position."""
    fw, valid = kmer_mod.extract_kmers(bases, valid_len, short_k)
    canon, _ = kmer_mod.canonical(fw, short_k)
    c, p, l = canon.shape
    owned = owned_mask(start, read_len, stride, p, short_k, k) & valid
    return canon, valid, owned


def solid_kmers(batch_arrays, k: int, short_k: int, cov_threshold: int,
                bloom_filter: bloom_mod.BloomFilter,
                add_to_bloom: bool = True, need_short_table: bool = True):
    """Full solidity stage over a device-resident chunked read batch.

    ``batch_arrays`` = (packed, valid_len, read_id, start, read_len) as
    jnp arrays; ``stride = chunk_len - k + 1`` is recovered statically from
    shapes.  Returns ``(SolidResult, BloomFilter, per-read seed info)``
    where seed info is ``(seed_pos [R?]...)`` computed by the caller via
    :func:`first_solid_per_read` (needs num_reads, a host-static value).
    """
    packed, valid_len, read_id, start, read_len = batch_arrays
    bases = kmer_mod.unpack_bases(packed)
    c, chunk_len = bases.shape
    stride = chunk_len - k + 1

    # ---- stage A: exact short-k counting (hot loop #1 replacement) ----
    # ONE sort yields both the per-position counts the window-min consumes
    # and the exact count table (checkpointable; the reference discards the
    # map after MakeBF).
    s_canon, s_valid, s_owned = short_kmer_positions(
        bases, valid_len, start, read_len, stride, short_k, k)
    l_s = s_canon.shape[-1]
    # need_short_table=False skips the table-compaction sort: the
    # single-shot pipeline only consumes the per-position counts (the
    # exact short table is wanted by streaming accumulation and sweeps).
    short_table, per_pos = count_mod.count_positions_table(
        s_canon.reshape(-1, l_s), s_valid.reshape(-1),
        s_owned.reshape(-1), k=short_k, want_table=need_short_table)
    short_counts = per_pos.reshape(c, -1)  # [C, P_short]

    # ---- stage B: window-min solidity (hot loops #2-#3 replacement) ----
    w = k - short_k + 1
    assert w >= 1, f"k ({k}) must be >= short_k ({short_k})"
    cov_est = window_min(short_counts, w)  # [C, P_short - w + 1] == [C, Pk]

    fw, valid_k = kmer_mod.extract_kmers(bases, valid_len, k)
    canon, _ = kmer_mod.canonical(fw, k)
    pk = fw.shape[1]
    owned_k = owned_mask(start, read_len, stride, pk, k, k) & valid_k
    assert cov_est.shape[1] == pk, (cov_est.shape, pk)

    is_solid = (cov_est >= cov_threshold) & valid_k

    # ---- Bloom insert of owned solid canonical k-mers (optional: the
    # exact-membership path skips the expensive scatter build) ----
    l = canon.shape[-1]
    if add_to_bloom:
        bf = bloom_mod.bloom_add(
            bloom_filter, canon.reshape(-1, l), k,
            mask=(is_solid & owned_k).reshape(-1))
    else:
        bf = bloom_filter

    return SolidResult(canon=canon, fw=fw, is_solid=is_solid,
                       owned=owned_k, short_table=short_table,
                       cov_est=cov_est), bf


def first_solid_per_read(result: SolidResult, read_id, start, num_reads: int):
    """Seed k-mers: the first solid large k-mer of each read, FORWARD form
    (``src/MakeBloomFilter.cpp:79-83`` stores ``GetStringKmer(kmer_Fw)``).

    Returns ``(seed_fw [R, L] uint32, has_seed [R] bool)``.

    Relies on the chunk layout contract (io/reads.py): chunks are emitted
    read-major with ascending start, and owned local positions ascend with
    global position -- so the flat (chunk, position) index order IS global
    position order within each read.  The per-read minimum then reduces to
    a cheap per-chunk row min (VPU reduction over the position axis)
    followed by a segment_min over the ~C chunk rows and an R-row gather;
    no N-row scatter/segment op remains (those run at only ~100M elem/s on
    TPU, tools/microbench.py).
    """
    c, pk, l = result.fw.shape
    n = c * pk
    solid_owned = result.is_solid & result.owned
    big = np.int32(2**30)
    flat = (jnp.arange(c, dtype=jnp.int32)[:, None] * pk
            + jnp.arange(pk, dtype=jnp.int32)[None, :])
    cand = jnp.where(solid_owned, flat, big)
    chunk_min = jnp.min(cand, axis=1)                        # [C]
    min_flat = jax.ops.segment_min(chunk_min, read_id,
                                   num_segments=num_reads)   # [R]
    has_seed = min_flat < big
    idx = jnp.clip(min_flat, 0, n - 1)
    seed = jnp.where(has_seed[:, None],
                     result.fw.reshape(n, l)[idx], np.uint32(0))
    return seed, has_seed
