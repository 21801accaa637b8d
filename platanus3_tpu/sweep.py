"""Solid-k-mer threshold sweep over error-prone reads (BASELINE config 2).

The reference hardcodes ``cov_threshold = 2`` (``src/MakeBloomFilter.cpp:
28``); on error-prone PacBio/ONT-like reads the right threshold separates
true genomic k-mers (coverage ~ depth) from error k-mers (coverage ~ 1-2),
and must be swept.  A naive sweep re-runs counting per threshold; here the
threshold only enters stage 1 as the final comparison ``window_min >= t``,
so ONE counting pass yields every threshold's answer:

    count + window-min once -> per-unique-k-mer MAX window-min coverage
    (one extra sort + segment-max) -> for each t, the solid set is
    ``max_cov >= t`` -- a vectorized comparison, free per threshold.

Against a truth genome the sweep reports precision/recall of the solid
set, plus (optionally) full assembly statistics per threshold.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.io import reads as reads_mod
from platanus3_tpu.ops import bloom as bloom_mod
from platanus3_tpu.ops import count as count_mod
from platanus3_tpu.ops import solid as solid_mod

__all__ = ["solid_threshold_sweep", "n50"]


def n50(lengths) -> int:
    """N50 of a length list: largest L such that contigs >= L cover half
    the total assembled bases."""
    ls = sorted((int(x) for x in lengths), reverse=True)
    total = sum(ls)
    if total == 0:
        return 0
    acc = 0
    for x in ls:
        acc += x
        if 2 * acc >= total:
            return x
    return ls[-1]


@partial(jax.jit, static_argnames=("k", "short_k"))
def _kmer_max_cov(packed, valid_len, read_id, start, read_len, *,
                  k, short_k):
    """Unique canonical k-mers with their MAX window-min coverage.

    Returns ``(keys [N, L], max_cov [N], size)`` -- the sufficient
    statistic for every threshold at once.
    """
    bf = bloom_mod.make_bloom(8, 1)
    result, _ = solid_mod.solid_kmers(
        (packed, valid_len, read_id, start, read_len),
        k, short_k, 1, bf, add_to_bloom=False)
    l = result.canon.shape[-1]
    canon = result.canon.reshape(-1, l)
    owned = result.owned.reshape(-1)
    cov = jnp.where(owned, result.cov_est.reshape(-1), -1)

    n = canon.shape[0]
    s_kmers, s_invalid, s_cov = count_mod.sort_kmers(canon, ~owned, cov, k=k)
    is_first, seg_id = count_mod._boundaries(s_kmers, s_invalid)
    seg_max = jax.ops.segment_max(
        jnp.where(s_invalid, -1, s_cov), seg_id, num_segments=n)
    pad = jnp.full((n, l), np.uint32(0xFFFFFFFF), dtype=jnp.uint32)
    keys = pad.at[seg_id].set(s_kmers)
    nvalid = jnp.sum((~s_invalid).astype(jnp.int32))
    size = jnp.where(nvalid > 0,
                     seg_id[jnp.maximum(nvalid - 1, 0)] + 1, 0)
    in_range = jnp.arange(n) < size
    keys = jnp.where(in_range[:, None], keys, pad)
    max_cov = jnp.where(in_range, seg_max, -1)
    return keys, max_cov, size.astype(jnp.int32)


def solid_threshold_sweep(source, config: AssemblyConfig, thresholds,
                          truth_genome: Optional[str] = None,
                          assemble_each: bool = False) -> list:
    """Sweep ``cov_threshold`` over one read set; one counting pass total.

    Returns one dict per threshold with ``n_solid`` and, when
    ``truth_genome`` is given, ``precision`` / ``recall`` / ``f1`` of the
    solid k-mer set vs the genome's true canonical k-mer set; with
    ``assemble_each``, full assembly stats (straights, junctions, N50,
    max/total unitig length).
    """
    if isinstance(source, reads_mod.ReadBatch):
        batch = source
    elif isinstance(source, (list, tuple)):
        batch = reads_mod.reads_from_strings(list(source), config.k,
                                             config.chunk_len)
    else:
        batch = reads_mod.load_reads(source, config.k, config.chunk_len)

    keys, max_cov, size = _kmer_max_cov(
        jnp.asarray(batch.packed), jnp.asarray(batch.valid_len),
        jnp.asarray(batch.read_id), jnp.asarray(batch.start),
        jnp.asarray(batch.read_len),
        k=config.k, short_k=min(config.short_k, config.k))

    in_truth = None
    truth_size = 0
    if truth_genome is not None:
        from platanus3_tpu.sim import genome_kmer_table
        truth = genome_kmer_table(truth_genome, config.k)
        in_truth = np.asarray(
            count_mod.lookup_join(truth, keys) > 0)
        truth_size = int(truth.size)

    max_cov = np.asarray(max_cov)
    size = int(size)
    valid = np.arange(max_cov.shape[0]) < size

    rows = []
    for t in thresholds:
        solid = valid & (max_cov >= int(t))
        row = {"threshold": int(t), "n_solid": int(solid.sum())}
        if in_truth is not None:
            tp = int((solid & in_truth).sum())
            fp = int(solid.sum()) - tp
            row["true_kmers"] = truth_size
            row["precision"] = tp / max(1, tp + fp)
            row["recall"] = tp / max(1, truth_size)
            denom = row["precision"] + row["recall"]
            row["f1"] = (2 * row["precision"] * row["recall"] / denom
                         if denom else 0.0)
        if assemble_each:
            from platanus3_tpu import pipeline
            import dataclasses
            cfg = dataclasses.replace(config, cov_threshold=int(t))
            res = pipeline.assemble(batch, cfg, write_output=False)
            lens = [len(s) for s in res.straight_seqs if s]
            row.update({
                "straights": res.num_straights,
                "junctions": res.num_junctions,
                "n50": n50(lens),
                "max_unitig": max(lens) if lens else 0,
                "total_unitig_bases": sum(lens),
                "solid_nodes": res.num_nodes,
            })
        rows.append(row)
    return rows
