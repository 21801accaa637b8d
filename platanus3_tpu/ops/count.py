"""Exact k-mer counting via sort + segment reduction.

TPU-native replacement for the reference's ``unordered_map``-based counter
(``ReadFile::CountShortKmer``, reference ``src/Load.cpp:105-127``) and for
the per-position count lookup inside ``MakeBF`` (reference
``src/MakeBloomFilter.cpp:46-58``).  Hash maps don't exist on a TPU; the
array-native equivalent is:

    flatten all canonical k-mers -> multi-key stable sort (lanes MSB-first)
    -> run-length boundaries -> segment ids -> counts per unique k-mer
    -> scatter counts back through the sort permutation to per-position
       counts.

One sort produces BOTH the global count table and the per-position counts
the solidity filter needs, replacing two hash-map passes.  All shapes are
static; invalid (padding) positions carry a dedicated sentinel key lane so
they sort to the end without colliding with real k-mers.

``KmerTable`` (sorted unique keys + counts + valid size) is this
framework's ``KmerCount`` (reference ``src/common.h:26``); lookups are
vectorized multiword binary searches (``lookup``), and tables support
padded concat-merge for streaming / sharded accumulation.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["KmerTable", "sort_kmers", "count_kmers", "count_with_positions",
           "count_positions_table", "count_solid_with_ids", "lookup",
           "merge_tables"]


class KmerTable(NamedTuple):
    """Sorted unique canonical k-mers with counts.

    keys:   ``[cap, L] uint32`` lexicographically sorted; rows >= size are
            all-ones padding (sorts last, never matches a real query after
            size masking).
    counts: ``[cap] int32`` (0 beyond size)
    size:   scalar int32 array -- number of valid rows
    """

    keys: jnp.ndarray
    counts: jnp.ndarray
    size: jnp.ndarray


jax.tree_util.register_pytree_node(
    KmerTable,
    lambda t: ((t.keys, t.counts, t.size), None),
    lambda _, leaves: KmerTable(*leaves),
)


def _has_spare_msb(kmers: jnp.ndarray, k: int | None) -> bool:
    """True when lane 0 of a k-mer provably never uses bit 31, so the
    invalid flag can ride there instead of as a separate sort operand."""
    if k is None:
        return False
    l = kmers.shape[-1]
    top_bits = 2 * k - 32 * (l - 1)  # significant bits in lane 0
    return 0 < top_bits < 32


_MSB = np.uint32(0x80000000)
_NOT_MSB = np.uint32(0x7FFFFFFF)


def sort_kmers(kmers: jnp.ndarray, invalid: jnp.ndarray, *payloads,
               k: int | None = None):
    """Stable sort of ``[N, L]`` keys with invalids last.

    Returns ``(sorted_kmers [N, L], sorted_invalid [N], *sorted_payloads)``.
    Uses ``jax.lax.sort`` with the lanes MSB-first as keys -- this is the
    reference's canonical-k-mer ordering (``CompareBit``) lifted to a bulk
    sort.  The invalid flag is a leading extra key operand, EXCEPT when
    ``k`` is given and ``2k mod 32 != 0``: then lane 0's top bit is
    provably spare (the 2k-bit value is low-aligned, ops/kmer.py) and the
    flag is folded into it, saving one 4N-byte sort operand on the hot
    path.  Ordering is identical either way: valid keys in lex order,
    then invalid rows (by masked key bits, then input order).
    """
    n, l = kmers.shape
    if _has_spare_msb(kmers, k):
        lane0 = jnp.where(invalid, kmers[:, 0] | _MSB, kmers[:, 0])
        ops = [lane0] + [kmers[:, j] for j in range(1, l)] + list(payloads)
        out = jax.lax.sort(tuple(ops), num_keys=l, is_stable=True)
        s_invalid = (out[0] & _MSB) > 0
        s_kmers = jnp.stack((out[0] & _NOT_MSB,) + out[1:l], axis=-1)
        return (s_kmers, s_invalid) + tuple(out[l:])
    ops = [invalid.astype(jnp.uint32)] + [kmers[:, j] for j in range(l)]
    ops += list(payloads)
    out = jax.lax.sort(tuple(ops), num_keys=l + 1, is_stable=True)
    s_invalid = out[0] > 0
    s_kmers = jnp.stack(out[1 : l + 1], axis=-1)
    return (s_kmers, s_invalid) + tuple(out[l + 1 :])


def _boundaries(s_kmers: jnp.ndarray, s_invalid: jnp.ndarray):
    """First-occurrence flags and segment ids over sorted keys."""
    n = s_kmers.shape[0]
    prev_diff = jnp.any(s_kmers[1:] != s_kmers[:-1], axis=-1)
    prev_diff = prev_diff | (s_invalid[1:] != s_invalid[:-1])
    is_first = jnp.concatenate([jnp.ones((1,), dtype=bool), prev_diff])
    seg_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # [N]
    return is_first, seg_id


def count_kmers(kmers: jnp.ndarray, valid: jnp.ndarray,
                k: int | None = None) -> KmerTable:
    """Count unique canonical k-mers of a flat batch ``[N, L]``.

    Capacity of the returned table is N (static); ``size`` is the dynamic
    unique count.  Replaces hot loop #1 (``src/Load.cpp:118-124``).
    """
    t, _ = count_with_positions(kmers, valid, k=k)
    return t


def count_with_positions(kmers: jnp.ndarray, valid: jnp.ndarray,
                         contributes: jnp.ndarray | None = None,
                         k: int | None = None):
    """Count AND return the count of each input position's k-mer.

    Returns ``(KmerTable, per_position_counts [N] int32)`` where invalid
    positions get count 0.  The per-position counts are what the solidity
    window-min consumes (reference ``src/MakeBloomFilter.cpp:46-62``),
    obtained here by scattering segment counts back through the sort
    permutation instead of a second hash lookup pass.

    ``contributes`` (default ``valid``): positions that add +1 to their
    k-mer's count.  Chunked reads present overlap positions twice -- only
    the owning chunk's copy contributes, but BOTH copies still receive the
    k-mer's count in ``per_position_counts`` (they share a sort segment).
    """
    n, l = kmers.shape
    if contributes is None:
        contributes = valid
    # The contrib bit rides in the index payload's top bit (n < 2^31),
    # saving a 4N-byte sort operand.
    idx = jnp.arange(n, dtype=jnp.uint32)
    idx_packed = idx | jnp.where(contributes & valid, _MSB, np.uint32(0))
    s_kmers, s_invalid, s_idxp = sort_kmers(kmers, ~valid, idx_packed, k=k)
    s_idx = (s_idxp & _NOT_MSB).astype(jnp.int32)
    s_contrib = (s_idxp >> 31).astype(jnp.int32)
    is_first, seg_id = _boundaries(s_kmers, s_invalid)

    seg_count = jax.ops.segment_sum(
        jnp.where(s_invalid, 0, s_contrib), seg_id, num_segments=n
    )
    # Unique table: scatter each sorted row to its segment slot.
    pad = jnp.full((n, l), np.uint32(0xFFFFFFFF), dtype=jnp.uint32)
    keys = pad.at[seg_id].set(s_kmers)
    num_valid_rows = jnp.sum((~s_invalid).astype(jnp.int32))
    # Segments are ordered: valid segments first (invalid sentinel sorts
    # last), so table size = seg_id of last valid element + 1.
    size = jnp.where(
        num_valid_rows > 0,
        seg_id[jnp.maximum(num_valid_rows - 1, 0)] + 1,
        0,
    ).astype(jnp.int32)
    counts = jnp.where(jnp.arange(n) < size, seg_count, 0)
    keys = jnp.where((jnp.arange(n) < size)[:, None], keys, pad)

    per_pos = jnp.zeros((n,), dtype=jnp.int32).at[s_idx].set(
        jnp.where(s_invalid, 0, seg_count[seg_id])
    )
    return KmerTable(keys=keys, counts=counts, size=size), per_pos


def count_positions_table(kmers: jnp.ndarray, valid: jnp.ndarray,
                          contributes: jnp.ndarray, k: int | None = None):
    """Per-position counts AND the contributing-unique table from ONE sort.

    Fuses what was previously two full sorts in the solidity stage
    (``count_with_positions`` for the per-position short-k counts feeding
    the window-min, then ``count_kmers`` for the exact short-k table):
    the table of k-mers with >= 1 contributing occurrence is compacted out
    of the same sorted run the per-position counts come from.

    Returns ``(KmerTable, per_position_counts [N] int32)``; the table is
    exactly ``count_kmers(kmers, contributes & valid)`` and the counts are
    exactly ``count_with_positions(kmers, valid, contributes)[1]``.
    """
    n, l = kmers.shape
    contributes = contributes & valid
    idx = jnp.arange(n, dtype=jnp.uint32)
    idx_packed = idx | jnp.where(contributes, _MSB, np.uint32(0))
    s_kmers, s_invalid, s_idxp = sort_kmers(kmers, ~valid, idx_packed, k=k)
    s_idx = (s_idxp & _NOT_MSB).astype(jnp.int32)
    s_contrib = (s_idxp >> 31).astype(jnp.int32)
    is_first, seg_id = _boundaries(s_kmers, s_invalid)
    seg_count = jax.ops.segment_sum(
        jnp.where(s_invalid, 0, s_contrib), seg_id, num_segments=n)
    # Compact segments with >= 1 contribution into table rows (rank among
    # contributing segments, as in count_solid_with_ids).
    row_in_table = (seg_count[seg_id] > 0) & ~s_invalid
    tab_first = is_first & row_in_table
    tab_rank = jnp.cumsum(tab_first.astype(jnp.int32)) - 1
    size = jnp.sum(tab_first.astype(jnp.int32)).astype(jnp.int32)
    pad = jnp.full((n, l), np.uint32(0xFFFFFFFF), dtype=jnp.uint32)
    tgt = jnp.where(tab_first, tab_rank, n)
    keys = pad.at[tgt].set(s_kmers, mode="drop")
    counts = jnp.zeros((n,), jnp.int32).at[tgt].set(
        seg_count[seg_id], mode="drop")
    per_pos = jnp.zeros((n,), dtype=jnp.int32).at[s_idx].set(
        jnp.where(s_invalid, 0, seg_count[seg_id]))
    return KmerTable(keys=keys, counts=counts, size=size), per_pos


def count_solid_with_ids(kmers: jnp.ndarray, valid: jnp.ndarray,
                         contributes: jnp.ndarray, k: int | None = None):
    """Solid-node table AND per-position node ids from ONE sort.

    ``kmers [N, L]``: canonical k-mer at every read position;
    ``valid``: positions that should receive a node id (owned, in-read);
    ``contributes``: positions whose occurrence makes the k-mer a node and
    adds +1 to its count (solid & owned).

    Returns ``(KmerTable, per_pos_nid [N] int32)`` where the table holds
    the unique k-mers with >= 1 contribution (lexicographically sorted --
    the same table ``count_kmers(kmers, contributes)`` builds), and
    ``per_pos_nid[i]`` is the table row of position i's k-mer (-1 when the
    k-mer is not a node or the position is invalid).

    This makes the coverage pass (reference ``CountNodeCoverage``,
    ``src/DeBruijnGraph.cpp:393-449``) a pure scatter: the node-id
    resolution that previously needed a second full sort-join over all
    read positions (graph/coverage.py) falls out of the sort stage 1
    already performs to build the node table.
    """
    n, l = kmers.shape
    contributes = contributes & valid
    idx = jnp.arange(n, dtype=jnp.uint32)
    idx_packed = idx | jnp.where(contributes, _MSB, np.uint32(0))
    s_kmers, s_invalid, s_idxp = sort_kmers(kmers, ~valid, idx_packed, k=k)
    s_idx = (s_idxp & _NOT_MSB).astype(jnp.int32)
    s_contrib = (s_idxp >> 31).astype(jnp.int32)
    is_first, seg_id = _boundaries(s_kmers, s_invalid)
    seg_count = jax.ops.segment_sum(
        jnp.where(s_invalid, 0, s_contrib), seg_id, num_segments=n)
    # A segment is a node iff it has >= 1 contributing occurrence.
    row_is_node = (seg_count[seg_id] > 0) & ~s_invalid
    node_first = is_first & row_is_node
    # Node id = rank among node segments; constant within a segment
    # because node_first fires only on the segment's first row.
    node_rank = jnp.cumsum(node_first.astype(jnp.int32)) - 1
    size = jnp.sum(node_first.astype(jnp.int32)).astype(jnp.int32)

    pad = jnp.full((n, l), np.uint32(0xFFFFFFFF), dtype=jnp.uint32)
    tgt = jnp.where(node_first, node_rank, n)
    keys = pad.at[tgt].set(s_kmers, mode="drop")
    counts = jnp.zeros((n,), jnp.int32).at[tgt].set(
        seg_count[seg_id], mode="drop")

    nid_sorted = jnp.where(row_is_node, node_rank, -1).astype(jnp.int32)
    per_pos_nid = jnp.zeros((n,), jnp.int32).at[s_idx].set(nid_sorted)
    return KmerTable(keys=keys, counts=counts, size=size), per_pos_nid


def _lex_less_rows(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a < b lexicographic over last axis, elementwise on leading axes."""
    l = a.shape[-1]
    less = jnp.zeros(a.shape[:-1], dtype=bool)
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for j in range(l):
        less = less | (eq & (a[..., j] < b[..., j]))
        eq = eq & (a[..., j] == b[..., j])
    return less


def searchsorted_rows(table_keys: jnp.ndarray, size, queries: jnp.ndarray,
                      max_log2: int | None = None) -> jnp.ndarray:
    """Vectorized lower-bound binary search of ``[Q, L]`` queries in a
    ``[cap, L]`` sorted key table (first ``size`` rows valid).

    ~log2(cap) gather+compare rounds, all queries in parallel -- the bulk
    replacement for per-k-mer hash lookups.
    """
    cap = table_keys.shape[0]
    steps = max_log2 if max_log2 is not None else max(1, int(cap).bit_length())
    q = queries.shape[0]
    lo = jnp.zeros((q,), dtype=jnp.int32)
    hi = jnp.broadcast_to(jnp.asarray(size, jnp.int32), (q,))

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        mid_keys = table_keys[mid]
        go_right = _lex_less_rows(mid_keys, queries)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def lookup(table: KmerTable, queries: jnp.ndarray) -> jnp.ndarray:
    """Counts for ``[Q, L]`` query k-mers (0 when absent)."""
    pos = searchsorted_rows(table.keys, table.size, queries)
    pos_c = jnp.minimum(pos, table.keys.shape[0] - 1)
    hit = jnp.all(table.keys[pos_c] == queries, axis=-1) & (pos < table.size)
    return jnp.where(hit, table.counts[pos_c], 0)


def lookup_id(table: KmerTable, queries: jnp.ndarray) -> jnp.ndarray:
    """Row index of each query in the table, or -1 when absent."""
    pos = searchsorted_rows(table.keys, table.size, queries)
    pos_c = jnp.minimum(pos, table.keys.shape[0] - 1)
    hit = jnp.all(table.keys[pos_c] == queries, axis=-1) & (pos < table.size)
    return jnp.where(hit, pos_c, -1)


def lookup_id_join(table: KmerTable, queries: jnp.ndarray) -> jnp.ndarray:
    """Row index of each query in the table (-1 absent), via SORT-JOIN.

    TPU-native alternative to the binary search in :func:`lookup_id`: the
    per-round gathers of a 20-round binary search are random-access and
    slow at tens of millions of queries; one stable multi-key sort of
    (table keys ++ queries) followed by segment-first propagation does the
    same join in a single sort pass.  Within each equal-key segment the
    table row (unique) sorts FIRST (is_query is the last sort key), so the
    answer for every query is the id carried by its segment's first row.

    Also immune to the 0xFF..FF padding-collision edge: table pad rows
    carry an invalid flag that is part of the sort key, so a query whose
    bit pattern equals the padding never joins to it.
    """
    m, l = table.keys.shape
    q = queries.shape[0]
    n = m + q
    row = jnp.arange(m, dtype=jnp.int32)
    pad_invalid = (row >= table.size).astype(jnp.uint32)
    keys = jnp.concatenate([table.keys, queries], axis=0)
    invalid = jnp.concatenate(
        [pad_invalid, jnp.zeros((q,), jnp.uint32)])
    is_query = jnp.concatenate(
        [jnp.zeros((m,), jnp.uint32), jnp.ones((q,), jnp.uint32)])
    ids = jnp.concatenate([row, jnp.full((q,), np.int32(-1))])
    qidx = jnp.concatenate([jnp.full((m,), np.int32(-1)),
                            jnp.arange(q, dtype=jnp.int32)])

    ops = ([invalid] + [keys[:, j] for j in range(l)] + [is_query, ids, qidx])
    out = jax.lax.sort(tuple(ops), num_keys=l + 2, is_stable=False)
    s_inv = out[0]
    s_lanes = out[1 : l + 1]
    s_isq, s_ids, s_qidx = out[l + 1], out[l + 2], out[l + 3]

    diff = s_inv[1:] != s_inv[:-1]
    for j in range(l):
        diff = diff | (s_lanes[j][1:] != s_lanes[j][:-1])
    is_first = jnp.concatenate([jnp.ones((1,), bool), diff])
    # Index of each row's segment start (monotone cummax trick).
    seg_start = jax.lax.cummax(
        jnp.where(is_first, jnp.arange(n, dtype=jnp.int32), 0))
    candidate = s_ids[seg_start]          # -1 when segment has no table row
    out_ids = jnp.full((q,), np.int32(-1))
    out_ids = out_ids.at[jnp.where(s_isq > 0, s_qidx, q)].set(
        candidate, mode="drop")
    return out_ids


def lookup_join(table: KmerTable, queries: jnp.ndarray) -> jnp.ndarray:
    """Counts for each query (0 when absent), via sort-join (see
    :func:`lookup_id_join`)."""
    ids = lookup_id_join(table, queries)
    idc = jnp.clip(ids, 0, table.keys.shape[0] - 1)
    return jnp.where(ids >= 0, table.counts[idc], 0)


def merge_into(dst: KmerTable, src: KmerTable, cap: int) -> KmerTable:
    """Merge ``src`` into ``dst`` keeping a FIXED capacity ``cap``.

    Streaming accumulation: static shapes mean one XLA compile no matter
    how many batches are merged.  Returns the merged table truncated to
    ``cap`` rows; the caller must check ``size <= cap`` (overflow means
    the unique-k-mer estimate was too low -- counts would silently drop).
    """
    merged = merge_tables(dst, src)
    return KmerTable(keys=merged.keys[:cap], counts=merged.counts[:cap],
                     size=merged.size)


def merge_tables(a: KmerTable, b: KmerTable) -> KmerTable:
    """Merge two count tables (concat -> sort -> segment-sum).

    Capacity of the result is ``cap_a + cap_b``; used by the streaming
    counter and the all-to-all sharded reduction.
    """
    keys = jnp.concatenate([a.keys, b.keys], axis=0)
    counts = jnp.concatenate([a.counts, b.counts], axis=0)
    n = keys.shape[0]
    row = jnp.arange(n)
    invalid = ~((row < a.size) | ((row >= a.keys.shape[0]) &
                                  (row < a.keys.shape[0] + b.size)))
    s_keys, s_invalid, s_counts = sort_kmers(keys, invalid, counts)
    is_first, seg_id = _boundaries(s_keys, s_invalid)
    seg_count = jax.ops.segment_sum(
        jnp.where(s_invalid, 0, s_counts), seg_id, num_segments=n
    )
    pad = jnp.full_like(s_keys, np.uint32(0xFFFFFFFF))
    out_keys = pad.at[seg_id].set(s_keys)
    nvalid = jnp.sum((~s_invalid).astype(jnp.int32))
    size = jnp.where(nvalid > 0,
                     seg_id[jnp.maximum(nvalid - 1, 0)] + 1, 0).astype(jnp.int32)
    out_counts = jnp.where(jnp.arange(n) < size, seg_count, 0)
    out_keys = jnp.where((jnp.arange(n) < size)[:, None], out_keys, pad)
    return KmerTable(keys=out_keys, counts=out_counts, size=size)
