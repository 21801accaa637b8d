"""Streaming (bounded-memory) mode must reproduce the single-shot
pipeline bit for bit."""

import numpy as np

from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.constants import BASES
from platanus3_tpu.pipeline import assemble
from platanus3_tpu.streaming import assemble_streaming

RNG = np.random.default_rng(83)


def rand_genome(n, rng=RNG):
    return "".join(rng.choice(list(BASES), size=n))


def tiled_reads(genome, read_len, step):
    return [genome[s : s + read_len]
            for s in range(0, len(genome) - read_len + 1, step)]


def cfg(**kw):
    kw.setdefault("chunk_len", 256)
    kw.setdefault("log_path", None)
    return AssemblyConfig(k=25, **kw)


def test_streaming_equals_single_shot():
    genome = rand_genome(4000)
    reads = tiled_reads(genome, 300, 60)
    single = assemble(reads, cfg(), write_output=False)
    # Tiny slices force many merge rounds.
    multi = assemble_streaming(reads, cfg(), write_output=False,
                               slice_chunks=16)
    assert single.gfa_lines == multi.gfa_lines
    assert single.num_nodes == multi.num_nodes


def test_streaming_repeat_genome():
    rng = np.random.default_rng(87)
    rep = rand_genome(120, rng)
    genome = (rand_genome(700, rng) + rep + rand_genome(700, rng) + rep
              + rand_genome(700, rng))
    reads = tiled_reads(genome, 180, 35)
    single = assemble(reads, cfg(chunk_len=512), write_output=False)
    multi = assemble_streaming(reads, cfg(chunk_len=512),
                               write_output=False, slice_chunks=8)
    assert single.gfa_lines == multi.gfa_lines


def test_streaming_cap_overflow_raises():
    genome = rand_genome(3000)
    reads = tiled_reads(genome, 300, 60)
    import pytest
    with pytest.raises(RuntimeError, match="short_cap"):
        assemble_streaming(reads, cfg(), write_output=False,
                           slice_chunks=16, short_cap=64)


def test_streaming_simplify_matches_single_shot():
    # Tips+bubbles through the STREAMING pipeline == single-shot pipeline.
    import dataclasses
    from platanus3_tpu import sim
    from platanus3_tpu.pipeline import assemble
    from platanus3_tpu.streaming import assemble_streaming
    from platanus3_tpu.config import AssemblyConfig

    hap1 = sim.random_genome(3000, seed=60)
    hap2 = sim.mutate_genome(hap1, 2, seed=61, min_gap=300)
    reads = (sim.simulate_reads(hap1, 15, 300, seed=62, sub_rate=0.004)
             + sim.simulate_reads(hap2, 15, 300, seed=63, sub_rate=0.004))
    cfg = AssemblyConfig(k=25, cov_threshold=3, chunk_len=256,
                         clip_tips=True, pop_bubbles=True,
                         log_path=None, gfa_path="/tmp/ts_simp.gfa")
    a = assemble(reads, cfg, write_output=False)
    b = assemble_streaming(reads, cfg, write_output=False,
                           slice_chunks=16)
    assert sorted(a.gfa_lines) == sorted(b.gfa_lines)
    assert a.num_straights == b.num_straights


def test_streaming_mesh_equals_single_device_streaming():
    """streaming x mesh (BASELINE config 5 topology, VERDICT r1 item 2):
    hash-prefix-sharded accumulator tables + all-to-all slice routing on a
    4-device mesh must be byte-identical to single-device streaming AND to
    the single-shot pipeline."""
    import jax
    from platanus3_tpu.parallel import sharded

    genome = rand_genome(3000, np.random.default_rng(91))
    reads = tiled_reads(genome, 300, 60)
    single = assemble_streaming(reads, cfg(), write_output=False,
                                slice_chunks=16)
    mesh = sharded.make_mesh(jax.devices()[:4])
    meshed = assemble_streaming(reads, cfg(), write_output=False,
                                slice_chunks=16, mesh=mesh)
    assert single.gfa_lines == meshed.gfa_lines
    assert single.num_nodes == meshed.num_nodes
    shot = assemble(reads, cfg(), write_output=False)
    assert shot.gfa_lines == meshed.gfa_lines


def test_streaming_mesh_repeat_with_simplify():
    import jax
    from platanus3_tpu.parallel import sharded

    rng = np.random.default_rng(93)
    rep = rand_genome(120, rng)
    genome = (rand_genome(600, rng) + rep + rand_genome(600, rng) + rep
              + rand_genome(600, rng))
    reads = tiled_reads(genome, 180, 35)
    c = cfg(chunk_len=512, clip_tips=True, pop_bubbles=True)
    single = assemble_streaming(reads, c, write_output=False,
                                slice_chunks=8)
    mesh = sharded.make_mesh(jax.devices()[:4])
    meshed = assemble_streaming(reads, c, write_output=False,
                                slice_chunks=8, mesh=mesh)
    assert single.gfa_lines == meshed.gfa_lines
