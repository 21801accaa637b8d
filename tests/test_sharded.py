"""Multi-device sharding tests on the virtual 8-CPU-device mesh.

SURVEY.md §4 test plan item 3: the N-device result must be BITWISE equal
to the 1-device result -- the all-to-all count shuffle and allreduce-OR
Bloom merge are pure-functional re-partitionings of the same computation.
"""

import numpy as np
import pytest
import jax

from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.constants import BASES
from platanus3_tpu.parallel import sharded
from platanus3_tpu.pipeline import assemble

RNG = np.random.default_rng(23)


def rand_genome(n):
    return "".join(RNG.choice(list(BASES), size=n))


def tiled_reads(genome, read_len, step):
    return [genome[s : s + read_len]
            for s in range(0, len(genome) - read_len + 1, step)]


def cfg(**kw):
    kw.setdefault("chunk_len", 256)
    kw.setdefault("log_path", None)
    return AssemblyConfig(k=25, **kw)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return sharded.make_mesh(jax.devices()[:8])


def test_sharded_equals_single_device(mesh):
    genome = rand_genome(3000)
    reads = tiled_reads(genome, 200, 40)
    single = assemble(reads, cfg(), write_output=False)
    multi = assemble(reads, cfg(), write_output=False, mesh=mesh)
    assert single.gfa_lines == multi.gfa_lines  # bitwise-equal output
    assert single.num_nodes == multi.num_nodes


def test_sharded_repeat_genome_equal(mesh):
    rep = rand_genome(120)
    genome = (rand_genome(600) + rep + rand_genome(600) + rep
              + rand_genome(600))
    reads = tiled_reads(genome, 180, 35)
    single = assemble(reads, cfg(chunk_len=512), write_output=False)
    multi = assemble(reads, cfg(chunk_len=512), write_output=False, mesh=mesh)
    assert single.gfa_lines == multi.gfa_lines


def test_sharded_two_devices(mesh):
    two = sharded.make_mesh(jax.devices()[:2])
    genome = rand_genome(1500)
    reads = tiled_reads(genome, 150, 50)
    single = assemble(reads, cfg(), write_output=False)
    multi = assemble(reads, cfg(), write_output=False, mesh=two)
    assert single.gfa_lines == multi.gfa_lines


def test_ablated_collectives_compiles_and_runs(mesh):
    """The collective-ablation mode (benchmarks/scaling.py's collective-%
    measurement) must compile and execute; its RESULTS are wrong by
    construction and are not compared -- only shapes and liveness."""
    from platanus3_tpu.io import reads as reads_mod
    from platanus3_tpu.ops import bloom as bloom_mod
    genome = rand_genome(2000)
    reads = tiled_reads(genome, 200, 40)
    batch = reads_mod.reads_from_strings(reads, 25, 256)
    bf = bloom_mod.make_bloom(16, 4)
    arrays = sharded.pad_batch_to_devices(
        (batch.packed, batch.valid_len, batch.read_id, batch.start,
         batch.read_len), 8)
    full = sharded.sharded_stage1(
        mesh, *arrays, bf, k=25, short_k=21, cov_threshold=2,
        num_reads=batch.num_reads, add_to_bloom=True)
    abl = sharded.sharded_stage1(
        mesh, *arrays, bf, k=25, short_k=21, cov_threshold=2,
        num_reads=batch.num_reads, add_to_bloom=True,
        ablate_collectives=True)
    assert abl[0].keys.shape == full[0].keys.shape
    assert int(abl[0].size) >= 1  # ran to completion, produced a table
