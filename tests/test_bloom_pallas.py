"""Pallas packed-Bloom kernel vs the XLA sort+dedup+scatter-add path.

Both paths share the probe math (ops/hashing.py) AND the packed word
layout (bit ``p`` -> word ``p >> 5``, bit ``p & 31``), so for identical
(log2_bits, num_hashes) the Pallas kernel's word array must be
bit-identical to ops/bloom.py's production build.  Runs in interpret
mode on CPU; the compiled path is exercised on real TPU by the
benchmark tooling.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from platanus3_tpu.constants import BASES
from platanus3_tpu.ops import bloom as B
from platanus3_tpu.ops import bloom_pallas as BP
from platanus3_tpu.ops import kmer as K

RNG = np.random.default_rng(71)


def canon_batch(n, k):
    strs = ["".join(RNG.choice(list(BASES), size=k)) for _ in range(n)]
    canon, _ = K.canonical(jnp.asarray(K.encode_kmers_np(strs)), k)
    return canon


@pytest.mark.parametrize("k,log2_bits,hashes", [(25, 18, 6), (32, 20, 10)])
def test_packed_matches_bytewise(k, log2_bits, hashes):
    canon = canon_batch(3000, k)
    mask = jnp.asarray(RNG.random(3000) < 0.8)

    words = BP.build_packed_bloom(canon, k, mask, log2_bits, hashes,
                                  interpret=True)

    bf = B.make_bloom(1 << log2_bits, hashes)
    bf = B.bloom_add(bf, canon, k, mask=mask)

    # Bit-identical filters (both are packed little-endian-bit words).
    assert np.array_equal(np.asarray(bf.bits), np.asarray(words))

    # Identical query answers on members and random probes.
    probes = canon_batch(2000, k)
    got = np.asarray(BP.query_packed(words, probes, k, log2_bits, hashes))
    want = np.asarray(B.bloom_query(bf, probes, k))
    assert np.array_equal(got, want)
    got_m = np.asarray(BP.query_packed(words, canon, k, log2_bits, hashes))
    want_m = np.asarray(B.bloom_query(bf, canon, k))
    assert np.array_equal(got_m, want_m)
    assert got_m[np.asarray(mask)].all()  # no false negatives


def test_packed_block_boundaries():
    # Filter larger than one kernel block (BLOCK_WORDS) exercises the
    # grid path and block-boundary routing.
    k = 25
    canon = canon_batch(4000, k)
    mask = jnp.ones((4000,), bool)
    log2_bits = 23  # 2^23 bits = 262144 words = 2 blocks of 2^17
    words = BP.build_packed_bloom(canon, k, mask, log2_bits, 8,
                                  interpret=True)
    q = np.asarray(BP.query_packed(words, canon, k, log2_bits, 8))
    assert q.all()


def test_blocked_bloom_no_false_negatives_and_fpr():
    k = 25
    canon = canon_batch(4000, k)
    mask = jnp.asarray(np.arange(4000) < 3000)
    words, ovf = BP.build_blocked_bloom(
        canon, k, mask, log2_bits=21, num_hashes=8, interpret=True,
        return_overflow=True)
    assert int(ovf) == 0
    q = np.asarray(BP.query_blocked(words, canon, k, 21, 8))
    assert q[:3000].all()          # no false negatives
    # masked-out kmers are (almost surely) absent at this load factor
    assert q[3000:].mean() < 0.05

    probe = canon_batch(4000, k)
    fpr = float(np.asarray(BP.query_blocked(probe, probe, k, 21, 8)).mean()) \
        if False else float(np.asarray(
            BP.query_blocked(words, probe, k, 21, 8)).mean())
    assert fpr < 0.05


def test_blocked_bloom_duplicates_and_empty():
    k = 32
    canon = canon_batch(64, k)
    dup = jnp.concatenate([canon] * 4, axis=0)
    words = BP.build_blocked_bloom(dup, k, jnp.ones(256, bool),
                                   log2_bits=19, num_hashes=6,
                                   interpret=True)
    assert bool(jnp.all(BP.query_blocked(words, canon, k, 19, 6)))

    w0, ovf0 = BP.build_blocked_bloom(
        canon, k, jnp.zeros(64, bool), log2_bits=19, num_hashes=6,
        interpret=True, return_overflow=True)
    assert int(ovf0) == 0
    assert int(jnp.sum(w0)) == 0
