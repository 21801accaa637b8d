"""Checkpoint/resume tests (new capability; reference recomputes always)."""

import numpy as np

from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.constants import BASES
from platanus3_tpu.pipeline import assemble

RNG = np.random.default_rng(53)


def test_stage1_checkpoint_roundtrip(tmp_path):
    genome = "".join(RNG.choice(list(BASES), size=1200))
    reads = [genome[s : s + 200] for s in range(0, 1001, 40)]
    cfg = AssemblyConfig(k=25, chunk_len=256, log_path=None,
                         checkpoint_dir=str(tmp_path))
    r1 = assemble(reads, cfg, write_output=False)
    assert any((tmp_path / d).is_dir() for d in tmp_path.iterdir())
    r2 = assemble(reads, cfg, write_output=False)  # resumes from checkpoint
    assert r1.gfa_lines == r2.gfa_lines

    # A different config digest must NOT reuse the checkpoint.
    cfg27 = AssemblyConfig(k=27, chunk_len=256, log_path=None,
                           checkpoint_dir=str(tmp_path))
    r3 = assemble(reads, cfg27, write_output=False)
    assert r3.gfa_lines != r1.gfa_lines or r3.num_nodes != r1.num_nodes
