"""Property tests for the k-mer bit layer against string semantics.

The behavioral oracle is plain string manipulation mirroring the
reference's ``src/BitCalc.cpp`` (encode/decode round trip, RC involution,
MSB-first canonical compare) -- SURVEY.md §4 test plan item 1.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from platanus3_tpu.constants import canonical_str, revcomp_str, BASES
from platanus3_tpu.ops import kmer as K

RNG = np.random.default_rng(0)

# 501/1001 cover the reference's large-k template envelope
# (src/Assemble.cpp:31-53 instantiates k up to 3001) -- VERDICT r1 #8.
KS = [5, 15, 16, 17, 21, 25, 31, 32, 33, 63, 64, 101, 128, 501, 1001]


def random_kmers(n, k):
    return ["".join(RNG.choice(list(BASES), size=k)) for _ in range(n)]


@pytest.mark.parametrize("k", KS)
def test_encode_decode_roundtrip(k):
    strs = random_kmers(20, k)
    enc = K.encode_kmers_np(strs)
    assert enc.shape == (20, K.num_lanes(k))
    assert K.decode_kmers_np(enc, k) == strs


@pytest.mark.parametrize("k", KS)
def test_revcomp_matches_strings(k):
    strs = random_kmers(20, k)
    enc = jnp.asarray(K.encode_kmers_np(strs))
    rc = np.asarray(K.revcomp(enc, k))
    assert K.decode_kmers_np(rc, k) == [revcomp_str(s) for s in strs]


@pytest.mark.parametrize("k", KS)
def test_revcomp_involution(k):
    enc = jnp.asarray(K.encode_kmers_np(random_kmers(20, k)))
    rc2 = K.revcomp(K.revcomp(enc, k), k)
    assert np.array_equal(np.asarray(rc2), np.asarray(enc))


@pytest.mark.parametrize("k", KS)
def test_canonical_matches_strings(k):
    strs = random_kmers(50, k)
    # Include palindromes when k is even (tie must keep forward form).
    if k % 2 == 0:
        half = "".join(RNG.choice(list(BASES), size=k // 2))
        strs.append(half + revcomp_str(half))
    enc = jnp.asarray(K.encode_kmers_np(strs))
    canon, is_fw = K.canonical(enc, k)
    got = K.decode_kmers_np(np.asarray(canon), k)
    want = [canonical_str(s) for s in strs]
    assert got == want
    for i, s in enumerate(strs):
        assert bool(is_fw[i]) == (s <= revcomp_str(s))


@pytest.mark.parametrize("k", [5, 16, 21, 32, 33])
def test_shift_in_right_left(k):
    strs = random_kmers(10, k)
    enc = jnp.asarray(K.encode_kmers_np(strs))
    for b, base in enumerate(BASES):
        right = K.shift_in_right(enc, np.uint32(b), k)
        want = [s[1:] + base for s in strs]
        assert K.decode_kmers_np(np.asarray(right), k) == want
        left = K.shift_in_left(enc, np.uint32(b), k)
        want = [base + s[:-1] for s in strs]
        assert K.decode_kmers_np(np.asarray(left), k) == want


@pytest.mark.parametrize("k", [5, 16, 21, 32])
def test_first_last_base(k):
    strs = random_kmers(10, k)
    enc = jnp.asarray(K.encode_kmers_np(strs))
    fb = np.asarray(K.first_base(enc, k))
    lb = np.asarray(K.last_base(enc, k))
    for i, s in enumerate(strs):
        assert BASES[fb[i]] == s[0]
        assert BASES[lb[i]] == s[-1]


@pytest.mark.parametrize("k", [5, 21, 25, 32, 33, 64])
def test_extract_kmers_matches_strings(k):
    # Two rows with different valid lengths inside a 128-wide chunk.
    n = 128
    s1 = "".join(RNG.choice(list(BASES), size=n))
    len2 = k + 7
    s2 = "".join(RNG.choice(list(BASES), size=len2))
    bases = np.zeros((2, n), dtype=np.uint8)
    bases[0] = [{"A": 0, "C": 1, "G": 2, "T": 3}[c] for c in s1]
    bases[1, :len2] = [{"A": 0, "C": 1, "G": 2, "T": 3}[c] for c in s2]
    lengths = jnp.asarray([n, len2], dtype=jnp.int32)

    fw, valid = K.extract_kmers(jnp.asarray(bases, dtype=jnp.uint32),
                                lengths, k)
    p = n - k + 1
    assert fw.shape == (2, p, K.num_lanes(k))
    v = np.asarray(valid)
    assert v[0].sum() == n - k + 1
    assert v[1].sum() == len2 - k + 1

    fw_np = np.asarray(fw)  # one transfer, then decode in bulk
    for row, s in [(0, s1), (1, s2)]:
        got = K.decode_kmers_np(fw_np[row], k)
        for pos in range(len(s) - k + 1):
            assert got[pos] == s[pos : pos + k], (row, pos)


def test_pack_unpack_roundtrip():
    bases = RNG.integers(0, 4, size=(3, 64), dtype=np.uint8)
    packed = K.pack_bases_np(bases)
    assert packed.shape == (3, 4)
    unpacked = np.asarray(K.unpack_bases(jnp.asarray(packed)))
    assert np.array_equal(unpacked, bases)


def test_is_palindrome():
    s = "ACGCGT"  # revcomp("ACGCGT") = "ACGCGT"
    assert revcomp_str(s) == s
    enc = jnp.asarray(K.encode_kmers_np([s, "ACGCGA"]))
    pal = np.asarray(K.is_palindrome(enc, 6))
    assert pal.tolist() == [True, False]
