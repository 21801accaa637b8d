"""Open-addressing Pallas count kernel vs the sort-based counter.

Runs in Pallas interpret mode on the CPU test platform; the compiled-TPU
path is exercised by bench/benchmark runs.  Oracle: ops/count.py
(count_kmers), itself tested against Python Counter semantics.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from platanus3_tpu.constants import BASES
from platanus3_tpu.ops import count as C
from platanus3_tpu.ops import count_pallas as OA
from platanus3_tpu.ops import kmer as K

RNG = np.random.default_rng(3)


def random_seq(n):
    return "".join(RNG.choice(list(BASES), size=n))


def _tables_equal(oa_table, ref_table):
    got = OA.oa_to_sorted(oa_table)
    sz, ref_sz = int(got.size), int(ref_table.size)
    assert sz == ref_sz
    assert np.array_equal(np.asarray(got.keys[:sz]),
                          np.asarray(ref_table.keys[:sz]))
    assert np.array_equal(np.asarray(got.counts[:sz]),
                          np.asarray(ref_table.counts[:sz]))


@pytest.mark.parametrize("k", [11, 25, 40])
def test_oa_counts_match_sort_counter(k):
    uniq = [random_seq(k) for _ in range(60)]
    picks = RNG.integers(0, len(uniq), size=500)
    kmers = jnp.asarray(K.encode_kmers_np([uniq[i] for i in picks]))
    canon, _ = K.canonical(kmers, k)
    contrib = jnp.asarray(RNG.random(500) < 0.8)

    t = OA.count_kmers_oa(canon, contrib, k, interpret=True)
    assert int(t.overflow) == 0
    _tables_equal(t, C.count_kmers(canon, contrib))


def test_oa_all_duplicates_single_slot():
    k = 25
    s = random_seq(k)
    kmers = jnp.asarray(K.encode_kmers_np([s] * 300))
    canon, _ = K.canonical(kmers, k)
    t = OA.count_kmers_oa(canon, jnp.ones(300, bool), k, interpret=True)
    assert int(t.overflow) == 0
    occ = np.asarray(t.counts > 0)
    assert occ.sum() == 1
    assert int(np.asarray(t.counts)[occ][0]) == 300


def test_oa_empty_input():
    k = 17
    kmers = jnp.asarray(K.encode_kmers_np([random_seq(k) for _ in range(8)]))
    canon, _ = K.canonical(kmers, k)
    t = OA.count_kmers_oa(canon, jnp.zeros(8, bool), k, interpret=True)
    assert int(t.overflow) == 0
    assert int(jnp.sum(t.counts)) == 0


def test_oa_allones_palindrome_key():
    # T*16 A*16 is its own reverse complement: its canonical encoding has
    # an all-ones lane, which must NOT read as an empty slot.
    k = 32
    s = "T" * 16 + "A" * 16
    kmers = jnp.asarray(K.encode_kmers_np([s] * 5))
    canon, _ = K.canonical(kmers, k)
    assert int(np.asarray(canon)[0, 0]) == 0xFFFFFFFF
    t = OA.count_kmers_oa(canon, jnp.ones(5, bool), k, interpret=True)
    assert int(t.overflow) == 0
    _tables_equal(t, C.count_kmers(canon, jnp.ones(5, bool)))
