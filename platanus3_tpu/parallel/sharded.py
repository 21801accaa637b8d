"""Hash-prefix-sharded k-mer counting over a device mesh.

The distributed design the reference has no counterpart for (SURVEY.md §2
"Parallelism inventory": the reference is a single process with
``std::thread`` batches).  This follows the BASELINE.json north star:

* reads stream DATA-PARALLEL: the chunked read batch is sharded over the
  mesh axis ``'d'`` (chunks are self-contained thanks to overlap packing,
  so sharding is a plain leading-axis split);

* the k-mer count table is sharded by HASH PREFIX: each extracted
  canonical k-mer is routed to owner shard ``h1(kmer) mod n`` with one
  ``jax.lax.all_to_all``; the owner counts its shard with the same
  sort/segment kernel as the single-chip path, and per-position counts
  ride the inverse all-to-all back to the source shard -- so window-min
  solidity stays local to the reads;

* Bloom filters are built per-shard from locally-owned solid k-mers and
  merged with an allreduce bitwise OR (``jax.lax.pmax`` on uint8 bits)
  over ICI;

* per-shard solid-node sets are hash-deduplicated shard-locally, then
  all-gathered and merged into the replicated node table for the (v1:
  replicated) graph stage -- "gathered and stitched on host 0" per the
  north star.

All-to-all buckets are fixed-capacity (static shapes): capacity =
``slack * N_local / n``.  With a uniform 32-bit hash the overflow
probability is negligible for real batch sizes; overflows are COUNTED and
returned so the caller can fail loudly rather than silently undercount
(SURVEY.md §7 hard part (e)).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from platanus3_tpu.ops import bloom as bloom_mod
from platanus3_tpu.ops import count as count_mod
from platanus3_tpu.ops import hashing
from platanus3_tpu.ops import kmer as kmer_mod
from platanus3_tpu.ops import solid as solid_mod
from platanus3_tpu.ops.windowmin import window_min

__all__ = ["make_mesh", "pad_batch_to_devices", "sharded_stage1"]


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("d",))


def _is_multiprocess(mesh: Mesh) -> bool:
    pi = jax.process_index()
    return any(d.process_index != pi for d in mesh.devices.flat)


def to_global(mesh: Mesh, x, spec=P("d")):
    """Host numpy -> global device array sharded by ``spec`` over ``mesh``.

    Single-process: a plain device_put.  Multi-process (every process
    holds the full host array, the test/moderate-input regime): each
    process contributes only its addressable shards via
    ``make_array_from_callback`` -- the standard multihost construction.
    """
    sh = jax.sharding.NamedSharding(mesh, spec)
    x = np.asarray(x)
    if not _is_multiprocess(mesh):
        return jax.device_put(x, sh)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def pad_batch_to_devices(arrays, n: int):
    """Pad chunk-leading-axis arrays to a multiple of n devices.

    Padding chunks have valid_len 0 (no valid positions) and read_id 0
    (harmless: masked everywhere).
    """
    packed, valid_len, read_id, start, read_len = arrays
    c = packed.shape[0]
    pad = (-c) % n
    if pad:
        packed = np.concatenate(
            [packed, np.zeros((pad, packed.shape[1]), packed.dtype)])
        valid_len = np.concatenate([valid_len, np.zeros(pad, valid_len.dtype)])
        read_id = np.concatenate([read_id, np.zeros(pad, read_id.dtype)])
        start = np.concatenate([start, np.zeros(pad, start.dtype)])
        read_len = np.concatenate([read_len, np.zeros(pad, read_len.dtype)])
    return packed, valid_len, read_id, start, read_len


class Routed(NamedTuple):
    """Bookkeeping of one all-to-all k-mer exchange (inside shard_map)."""
    recv_kmers: jnp.ndarray    # [n*cap, L] k-mers this shard owns
    recv_flags: jnp.ndarray    # [n*cap] 0 empty, 1 phantom, 2 contributes
    slot: jnp.ndarray          # [N] send-buffer slot per sorted row
    sendable: jnp.ndarray      # [N]
    s_idx: jnp.ndarray         # [N] original index per sorted row
    overflow: jnp.ndarray      # scalar: rows dropped (bucket cap exceeded)
    n: int
    cap: int
    ablate: bool = False


def _a2a(x, n, ablate: bool = False):
    if ablate:  # identity-routed: every shard keeps its own buckets
        return x
    return jax.lax.all_to_all(
        x.reshape((n, x.shape[0] // n) + x.shape[1:]),
        axis_name="d", split_axis=0, concat_axis=0,
    ).reshape(x.shape)


def or_allreduce(x, n, axis_name: str = "d", ablate: bool = False):
    """Bitwise-OR allreduce of a 1-D integer array inside ``shard_map``.

    No native OR collective exists, and ``psum``/``pmax`` are wrong for
    packed bitmask words, so: reduce_scatter (one ``all_to_all`` of
    equal segments, OR of the n received copies of this shard's segment)
    + ``all_gather`` -- 2x the bytes of an ideal allreduce, all riding
    ICI.  Used to merge packed Bloom filters (ops/bloom.py).

    ``ablate=True`` replaces the exchange with its local-compute shape
    (benchmarks/scaling.py measures the collective share by differencing
    full vs ablated walls; results are NOT correct in that mode)."""
    m = x.shape[0]
    pad = (-m) % n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    seg = x.reshape(n, -1)
    recv = seg if ablate else jax.lax.all_to_all(
        seg, axis_name, split_axis=0, concat_axis=0)
    local = jax.lax.reduce(recv, x.dtype.type(0), jax.lax.bitwise_or, (0,))
    if ablate:
        return jnp.broadcast_to(local, (n,) + local.shape).reshape(-1)[:m]
    out = jax.lax.all_gather(local, axis_name, axis=0, tiled=True)
    return out[:m] if pad else out


def route_to_owners(canon, valid, contrib, n: int, cap: int, k: int,
                    ablate: bool = False) -> Routed:
    """Sort [N, L] canonical k-mers by hash owner ``h1 % n`` and exchange
    fixed-capacity buckets with one ``all_to_all``.  Invalid rows are never
    sent; rows beyond a bucket's capacity are counted in ``overflow``."""
    nl, l = canon.shape
    h1, _ = hashing.double_hash(canon, k)
    owner = (h1 % np.uint32(n)).astype(jnp.int32)
    owner = jnp.where(valid, owner, n)  # invalid sorts last, never sent

    idx = jnp.arange(nl, dtype=jnp.int32)
    ops = [owner] + [canon[:, j] for j in range(l)] + [
        idx, contrib.astype(jnp.int32)]
    out = jax.lax.sort(tuple(ops), num_keys=1, is_stable=False)
    s_owner = out[0]
    s_lanes = out[1 : l + 1]
    s_idx, s_contrib = out[l + 1], out[l + 2]

    bucket = jax.ops.segment_sum(jnp.ones_like(s_owner), s_owner,
                                 num_segments=n + 1)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(bucket)[:-1]]).astype(jnp.int32)
    rank = idx - offs[jnp.clip(s_owner, 0, n)]
    sendable = (s_owner < n) & (rank < cap)
    overflow = jnp.sum(((s_owner < n) & (rank >= cap)).astype(jnp.int32))
    slot = jnp.where(sendable, s_owner * cap + rank, n * cap)

    send_kmers = jnp.full((n * cap, l), np.uint32(0xFFFFFFFF), jnp.uint32)
    send_kmers = send_kmers.at[slot].set(
        jnp.stack(s_lanes, axis=-1), mode="drop")
    send_flags = jnp.zeros((n * cap,), jnp.int32)
    send_flags = send_flags.at[slot].set(1 + s_contrib, mode="drop")

    recv_kmers = _a2a(send_kmers, n, ablate)
    recv_flags = _a2a(send_flags, n, ablate)
    return Routed(recv_kmers=recv_kmers, recv_flags=recv_flags, slot=slot,
                  sendable=sendable, s_idx=s_idx, overflow=overflow,
                  n=n, cap=cap, ablate=ablate)


def route_values_back(routed: Routed, r_values, nl: int):
    """Inverse all-to-all: per-owned-row int32 values -> per original
    input position (0 for unsent rows)."""
    n, cap = routed.n, routed.cap
    back = _a2a(r_values, n, routed.ablate)
    per_sorted = jnp.where(routed.sendable,
                           back[jnp.clip(routed.slot, 0, n * cap - 1)], 0)
    return jnp.zeros((nl,), jnp.int32).at[routed.s_idx].set(per_sorted)


def _route_and_count(canon, valid, contrib, n: int, cap: int, k: int,
                     ablate: bool = False):
    """All-to-all exchange of [N, L] canonical k-mers to hash owners;
    returns (per_position_counts [N], owner_table, overflow_count).

    The owner-side table is this shard's hash-prefix slice of the global
    count table.
    """
    nl, l = canon.shape
    routed = route_to_owners(canon, valid, contrib, n, cap, k, ablate)
    r_valid = routed.recv_flags > 0
    r_contrib = routed.recv_flags == 2
    table, r_counts = count_mod.count_with_positions(
        routed.recv_kmers, r_valid, r_contrib, k=k)
    per_pos = route_values_back(routed, r_counts, nl)
    return per_pos, table, routed.overflow


def sharded_stage1(mesh: Mesh, packed, valid_len, read_id, start, read_len,
                   bf: bloom_mod.BloomFilter, *, k: int, short_k: int,
                   cov_threshold: int, num_reads: int, slack: float = 1.5,
                   add_to_bloom: bool = True,
                   ablate_collectives: bool = False):
    """Distributed stage 1 (count + solidity + Bloom + node set + seeds).

    Inputs are GLOBAL (host) arrays; chunk count must divide the mesh size
    (see :func:`pad_batch_to_devices`).  Returns
    ``(node_keys [cap_g, L], node_valid [cap_g], bloom, seed_fw, has_seed,
    overflow)`` with the node set REPLICATED, counts/Bloom built via
    all-to-all + allreduce-OR as described in the module docstring.

    ``ablate_collectives=True`` replaces every collective (all-to-all
    routes, OR-allreduce, seed pmin/pmax, overflow psum) with its
    identity-routed local shape: same per-device compute and buffer
    traffic, zero inter-device communication.  Results are WRONG in that
    mode; its only use is differencing full vs ablated wall-clock to
    report the program's collective share (benchmarks/scaling.py,
    VERDICT r3 item 8)."""
    abl = ablate_collectives
    n = mesh.devices.size
    c = packed.shape[0]
    assert c % n == 0
    cl = c // n
    chunk_len = packed.shape[1] * 16
    stride = chunk_len - k + 1
    p_short = chunk_len - short_k + 1
    nl_short = cl * p_short
    pk = chunk_len - k + 1
    nl_k = cl * pk
    cap_s = int(math.ceil(slack * nl_short / n))
    cap_k = int(math.ceil(slack * nl_k / n))

    def local_fn(packed_l, valid_len_l, read_id_l, start_l, read_len_l,
                 bf_bits):
        bases = kmer_mod.unpack_bases(packed_l)

        # ---- short-k routing + counting ----
        s_canon, s_valid, s_owned = solid_mod.short_kmer_positions(
            bases, valid_len_l, start_l, read_len_l, stride, short_k, k)
        ls = s_canon.shape[-1]
        per_pos, _, ovf_s = _route_and_count(
            s_canon.reshape(-1, ls), s_valid.reshape(-1),
            s_owned.reshape(-1), n, cap_s, short_k, abl)
        short_counts = per_pos.reshape(cl, p_short)

        # ---- solidity ----
        w = k - short_k + 1
        cov_est = window_min(short_counts, w)
        fwk, valid_k = kmer_mod.extract_kmers(bases, valid_len_l, k)
        canon_k, _ = kmer_mod.canonical(fwk, k)
        owned_k = solid_mod.owned_mask(
            start_l, read_len_l, stride, pk, k, k) & valid_k
        is_solid = (cov_est >= cov_threshold) & valid_k
        solid_owned = is_solid & owned_k

        # ---- node set: hash-route solid k-mers, dedupe shard-locally ----
        lk = canon_k.shape[-1]
        per_k, node_shard, ovf_k = _route_and_count(
            canon_k.reshape(-1, lk), solid_owned.reshape(-1),
            solid_owned.reshape(-1), n, cap_k, k, abl)
        # node_shard: this shard's slice of the solid-node table.
        shard_keys = node_shard.keys[: n * cap_k]
        shard_rowvalid = jnp.arange(n * cap_k) < node_shard.size

        # ---- Bloom (skipped in exact mode): insert this shard's slice of
        # the DISTINCT node table (hash-disjoint across shards, so insert
        # volume is ~coverage-fold less than per-position adds) and merge
        # the packed words with a bitwise-OR allreduce ----
        if add_to_bloom:
            bf_local = bloom_mod.BloomFilter(bf_bits, bf.log2_bits,
                                             bf.num_hashes)
            bf_local = bloom_mod.bloom_add(
                bf_local, shard_keys, k, mask=shard_rowvalid)
            bits = or_allreduce(bf_local.bits, n, ablate=abl)
        else:
            bits = bf_bits

        # ---- seeds: global first solid position per read ----
        local_pos = jnp.arange(pk, dtype=jnp.int32)[None, :]
        gpos = start_l[:, None] + local_pos
        big = np.int32(2**30)
        gpos_m = jnp.where(solid_owned, gpos, big)
        flat_rid = jnp.broadcast_to(read_id_l[:, None], (cl, pk)).reshape(-1)
        min_pos_l = jax.ops.segment_min(gpos_m.reshape(-1), flat_rid,
                                        num_segments=num_reads)
        min_pos = min_pos_l if abl else jax.lax.pmin(min_pos_l, "d")
        is_first = solid_owned & (gpos == min_pos[read_id_l][:, None])
        seed_l = jnp.zeros((num_reads, lk), dtype=jnp.uint32)
        rid_b = jnp.broadcast_to(read_id_l[:, None], (cl, pk))
        tgt = jnp.where(is_first, rid_b, num_reads)
        seed_l = seed_l.at[tgt.reshape(-1)].max(
            fwk.reshape(-1, lk), mode="drop")
        seed_fw = seed_l if abl else jax.lax.pmax(seed_l, "d")
        has_seed = min_pos < big

        ovf = (ovf_s + ovf_k) if abl else jax.lax.psum(ovf_s + ovf_k, "d")
        return (shard_keys, shard_rowvalid, bits, seed_fw, has_seed, ovf)

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("d"), P("d"), P("d"), P("d"), P("d"), P()),
        out_specs=(P("d"), P("d"), P(), P(), P(), P()),
        check_vma=False,
    )
    shard_keys, shard_valid, bits, seed_fw, has_seed, ovf = fn(
        to_global(mesh, packed), to_global(mesh, valid_len),
        to_global(mesh, read_id), to_global(mesh, start),
        to_global(mesh, read_len), to_global(mesh, bf.bits, P()))

    # Merge shard-unique node sets into one sorted global table,
    # REPLICATED so every process can read it (multihost stitch on host 0
    # just reads its local copy).
    merge = jax.jit(partial(count_mod.count_kmers, k=k),
                    out_shardings=jax.sharding.NamedSharding(mesh, P()))
    node_table = merge(shard_keys, shard_valid)
    return (node_table, bf._replace(bits=bits), seed_fw, has_seed,
            jnp.max(ovf))
