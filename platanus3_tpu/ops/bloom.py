"""Bloom filter over device arrays.

TPU-native re-design of ``BF<Key>`` (reference ``src/bloomfilter.cpp``):
instead of one ``std::vector<bool>`` probed k-mer-at-a-time, the filter is a
device-resident bit array and add/query are BULK operations over whole
k-mer batches -- scatter-max for add, gather+reduce for query.  Membership
semantics match the reference exactly: ``num_hashes`` double-hash probes,
no false negatives, early-exit AND for queries (XLA fuses the reduction).

Representation: one byte per bit (``uint8``), which maps to plain XLA
scatter/gather.  A power-of-two size makes the probe modulus a mask (see
``ops/hashing.py``).  The byte representation costs 8x HBM vs packed bits
but removes the need for read-modify-write bit ops; a packed-u32 Pallas
variant is the planned speed-of-light upgrade and can reuse this module's
probe math unchanged.

The filter is a pytree, so it threads through ``jit``/``shard_map``; the
multi-host merge is an elementwise ``max`` (== bitwise OR), see
``parallel/``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from platanus3_tpu.ops import hashing

__all__ = ["BloomFilter", "make_bloom", "bloom_add", "bloom_query",
           "bloom_merge", "log2_ceil"]


class BloomFilter(NamedTuple):
    """Pytree Bloom filter.

    bits:       ``[2^log2_bits] uint8`` (0/1 per probe position)
    log2_bits:  static int
    num_hashes: static int (reference default 10, ``src/Options.cpp:12``)
    """

    bits: jnp.ndarray
    log2_bits: int
    num_hashes: int


# log2_bits / num_hashes are static metadata, not leaves.
jax.tree_util.register_pytree_node(
    BloomFilter,
    lambda bf: ((bf.bits,), (bf.log2_bits, bf.num_hashes)),
    lambda aux, leaves: BloomFilter(leaves[0], aux[0], aux[1]),
)


def log2_ceil(n: int) -> int:
    return max(3, int(n - 1).bit_length())


def make_bloom(min_bits: int, num_hashes: int) -> BloomFilter:
    """Allocate an empty filter with at least ``min_bits`` bits (rounded up
    to a power of two; the reference size is used verbatim as a modulus,
    ``src/bloomfilter.cpp:66`` -- rounding up only lowers the FPR)."""
    lb = log2_ceil(min_bits)
    assert lb <= 33, "filter larger than 2^33 bits not supported single-chip"
    return BloomFilter(
        bits=jnp.zeros((1 << lb,), dtype=jnp.uint8),
        log2_bits=lb,
        num_hashes=num_hashes,
    )


def _positions(bf: BloomFilter, kmers: jnp.ndarray, k: int) -> jnp.ndarray:
    h1, h2 = hashing.double_hash(kmers, k)
    return hashing.probe_positions(h1, h2, bf.num_hashes, bf.log2_bits)


def bloom_add(bf: BloomFilter, kmers: jnp.ndarray, k: int,
              mask: jnp.ndarray | None = None) -> BloomFilter:
    """Insert a batch of (canonical) k-mers ``[..., L]``.

    ``mask`` (``[...] bool``) drops masked k-mers (their probes scatter
    out-of-range and are dropped).  Scatter-max of 1 is an idempotent
    bitwise OR, so duplicate probes are harmless -- the bulk analog of
    ``BF::add`` (reference ``src/bloomfilter.cpp:68-74``).
    """
    pos = _positions(bf, kmers, k).astype(jnp.int32)
    if mask is not None:
        # Out-of-range + mode='drop' discards masked probes.
        pos = jnp.where(mask[..., None], pos, np.int32(1) << 30)
    bits = bf.bits.at[pos.reshape(-1)].max(np.uint8(1), mode="drop")
    return bf._replace(bits=bits)


def bloom_query(bf: BloomFilter, kmers: jnp.ndarray, k: int) -> jnp.ndarray:
    """Batch membership query -> ``[...] bool``.

    AND over ``num_hashes`` gathered probe bytes (``BF::possiblyContains``,
    reference ``src/bloomfilter.cpp:76-86``).
    """
    pos = _positions(bf, kmers, k).astype(jnp.int32)
    probes = bf.bits[pos]
    return jnp.min(probes, axis=-1) > 0


def bloom_merge(a: BloomFilter, b: BloomFilter) -> BloomFilter:
    """Bitwise-OR merge of two filters (for sharded construction)."""
    assert a.log2_bits == b.log2_bits and a.num_hashes == b.num_hashes
    return a._replace(bits=jnp.maximum(a.bits, b.bits))
