"""Pallas TPU kernel for bulk Bloom-filter construction.

XLA's scatter on TPU serializes one update at a time through the scalar
core with an HBM round-trip each -- measured 33 s to set 190M probe bits
in a 2^29-bit filter (vs 0.4 s for the whole counting sort).  This kernel
gets the same result ~two orders of magnitude faster by restructuring the
problem TPU-natively:

  1. probe BIT positions are computed vectorized (ops/hashing.py) and
     SORTED (one lax.sort -- TPU sorts are fast);
  2. block boundaries (first sorted position belonging to each filter
     block) come from one vectorized searchsorted;
  3. a Pallas kernel walks the grid of filter blocks; each instance DMAs
     its slice of sorted positions into VMEM and sets bits in a
     VMEM-resident block with scalar read-modify-writes (VMEM latency,
     not HBM), then writes the dense block out once.

The filter here is PACKED uint32 words (32 bits/word) -- 8x less HBM than
the byte-per-bit representation ``ops/bloom.py`` uses for the plain-XLA
path.  Both build paths produce identical membership semantics; queries
can use either layout (``query_packed`` gathers words and tests bits).

This is the "speed-of-light" kernel called for by the north star (packed
Bloom membership as a Pallas kernel over HBM-resident batches).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from platanus3_tpu.ops import hashing

__all__ = ["build_packed_bloom", "query_packed"]

# Words per filter block held in VMEM by one kernel instance (512 KB).
BLOCK_WORDS = 1 << 17
# Positions staged into VMEM per DMA round.
POS_CHUNK = 1 << 14


def _set_bits_kernel(bounds_ref, pos_hbm, out_ref, pos_vmem, sem):
    """Grid instance i owns filter words [i*BLOCK_WORDS, (i+1)*BLOCK_WORDS).

    bounds_ref (scalar-prefetch): [G+1] int32 -- slice of the sorted
    position array belonging to each block.
    """
    i = pl.program_id(0)
    lo = bounds_ref[i]
    hi = bounds_ref[i + 1]
    out_ref[:] = jnp.zeros_like(out_ref)
    word_base = i * np.int32(BLOCK_WORDS * 32)

    def chunk_body(c, _):
        start = lo + c * POS_CHUNK
        dma = pltpu.make_async_copy(
            pos_hbm.at[pl.ds(start, POS_CHUNK)],
            pos_vmem,
            sem,
        )
        dma.start()
        dma.wait()
        n = jnp.minimum(hi - start, POS_CHUNK)

        def bit_body(t, _):
            p = pos_vmem[t] - word_base
            w = jax.lax.shift_right_logical(p, 5)
            b = jnp.uint32(1) << (p.astype(jnp.uint32) & np.uint32(31))
            out_ref[w] = out_ref[w] | b
            return 0

        jax.lax.fori_loop(0, n, bit_body, 0)
        return 0

    n_chunks = (hi - lo + POS_CHUNK - 1) // POS_CHUNK
    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def build_packed_bloom(kmers: jnp.ndarray, k: int, mask: jnp.ndarray,
                       log2_bits: int, num_hashes: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Build a packed uint32 Bloom bit array from canonical k-mers.

    kmers ``[N, L] uint32``, mask ``[N] bool``; returns ``[2^log2_bits/32]
    uint32``.  Masked k-mers contribute sentinel positions past the filter
    end, which land in a discarded overflow block.
    """
    assert log2_bits >= 10
    m_bits = 1 << log2_bits
    n_words = m_bits // 32
    # One extra OVERFLOW block absorbs masked k-mers' sentinel positions;
    # it is sliced off at the end.
    base_blocks = (n_words + BLOCK_WORDS - 1) // BLOCK_WORDS
    grid = base_blocks + 1
    n_words_padded = grid * BLOCK_WORDS
    sentinel = np.int32(base_blocks * BLOCK_WORDS * 32)

    h1, h2 = hashing.double_hash(kmers, k)
    pos = hashing.probe_positions(h1, h2, num_hashes, log2_bits)
    pos = pos.astype(jnp.int32)
    pos = jnp.where(mask[..., None], pos, sentinel).reshape(-1)
    pos = jnp.sort(pos)
    # Pad so every POS_CHUNK-wide DMA read stays in-bounds.
    p = pos.shape[0]
    pad = POS_CHUNK + ((-p) % POS_CHUNK)
    pos = jnp.concatenate([pos, jnp.full((pad,), sentinel, jnp.int32)])

    block_edges = (jnp.arange(grid + 1, dtype=jnp.int32)
                   * np.int32(BLOCK_WORDS * 32))
    bounds = jnp.searchsorted(pos[:p], block_edges,
                              side="left").astype(jnp.int32)
    bounds = bounds.at[-1].set(p)  # overflow block ends at the real data

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BLOCK_WORDS,), lambda i, *_: (i,),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((POS_CHUNK,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    words = pl.pallas_call(
        _set_bits_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_words_padded,), jnp.uint32),
        interpret=interpret,
    )(bounds, pos)
    return words[:n_words]


def query_packed(words: jnp.ndarray, kmers: jnp.ndarray, k: int,
                 log2_bits: int, num_hashes: int) -> jnp.ndarray:
    """Membership query against a packed filter -> ``[...] bool``."""
    h1, h2 = hashing.double_hash(kmers, k)
    pos = hashing.probe_positions(h1, h2, num_hashes, log2_bits)
    w = (pos >> np.uint32(5)).astype(jnp.int32)
    b = pos & np.uint32(31)
    probe = (words[w] >> b) & np.uint32(1)
    return jnp.min(probe, axis=-1) > 0
