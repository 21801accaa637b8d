"""Regression: mid-stream merge overflow must fail loudly, not undercount.

VERDICT r1 weak #5: ``merge_into`` truncates the merged table to ``cap``
per slice, and only the FINAL ``size > cap`` check raised -- keys dropped
at an intermediate truncation could re-enter later with reset counts
while the final size drifted back under cap (silently wrong counts).
The fix latches an on-device overflow flag at EVERY merge.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from platanus3_tpu.ops import count as count_mod


def _table_from_keys(keys_u32):
    """Build a KmerTable from distinct single-lane u32 keys, count 1."""
    arr = jnp.asarray(np.asarray(keys_u32, np.uint32)[:, None])
    return count_mod.count_kmers(arr, jnp.ones((arr.shape[0],), bool))


def test_size_drifts_back_under_cap_after_truncation():
    """Demonstrates the failure the latch catches: after an intermediate
    truncation, a later merge of already-kept keys brings ``size`` back
    under cap -- the old final-size check would pass silently."""
    cap = 8
    a = _table_from_keys(np.arange(12))          # 12 distinct keys
    dst = count_mod.KmerTable(
        keys=jnp.full((cap, 1), np.uint32(0xFFFFFFFF)),
        counts=jnp.zeros((cap,), jnp.int32),
        size=jnp.zeros((), jnp.int32))
    m1 = count_mod.merge_into(dst, a, cap)
    assert int(m1.size) == 12 > cap              # overflow visible here...
    b = _table_from_keys(np.arange(4))           # subset of the KEPT prefix
    m2 = count_mod.merge_into(m1, b, cap)
    # ...but the next merge recomputes size from the surviving rows:
    assert int(m2.size) <= cap                   # drifted back under cap
    # keys 8..11 were silently dropped: their counts are unrecoverable.
    missing = count_mod.lookup(
        m2, jnp.asarray(np.arange(8, 12, dtype=np.uint32)[:, None]))
    assert int(jnp.sum(missing)) == 0


def test_streaming_raises_on_midstream_overflow():
    """assemble_streaming with an undersized cap raises instead of
    producing a wrong table, even when later slices repeat earlier keys."""
    from platanus3_tpu.config import AssemblyConfig
    from platanus3_tpu.streaming import assemble_streaming

    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), size=600))
    # Many reads covering the genome; distinct short k-mers ~600 >> cap.
    reads = [genome[i:i + 64] for i in range(0, 512, 16)] * 3
    cfg = AssemblyConfig(k=25, short_k=21, chunk_len=64,
                         use_exact_membership=True,
                         gfa_path="/tmp/p3_ovf.gfa",
                         log_path="/tmp/p3_ovf.log")
    with pytest.raises(RuntimeError, match="overflow"):
        assemble_streaming(reads, cfg, write_output=False,
                           short_cap=32, node_cap=1 << 14,
                           slice_chunks=4)
