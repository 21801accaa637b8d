"""End-to-end pipeline tests on synthetic genomes.

Oracle properties from SURVEY.md §4 (verified against the compiled
reference during the survey): an error-free linear genome with adequate
coverage and Bloom sizing assembles to exactly ONE straight segment
spanning the (solid part of the) genome, TWO terminal junction segments
(dead ends have degree != 1), and TWO L lines with (k-1)M overlap.
"""

import numpy as np
import pytest

from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.constants import BASES, canonical_str, revcomp_str
from platanus3_tpu.pipeline import assemble

RNG = np.random.default_rng(7)


def rand_genome(n):
    return "".join(RNG.choice(list(BASES), size=n))


def tiled_reads(genome, read_len, step):
    reads = []
    for s in range(0, max(1, len(genome) - read_len + 1), step):
        reads.append(genome[s : s + read_len])
    return reads


def parse(lines):
    straights, junctions, links = [], [], []
    for ln in lines:
        f = ln.split("\t")
        if f[0] == "S":
            (straights if f[1].startswith("Straight") else junctions).append(
                f[2])
        elif f[0] == "L":
            links.append(tuple(f[1:]))
    return straights, junctions, links


def cfg(k=25, **kw):
    kw.setdefault("chunk_len", 256)
    kw.setdefault("gfa_path", "/tmp/test_out.gfa")
    kw.setdefault("log_path", None)
    return AssemblyConfig(k=k, **kw)


def test_duplicated_read_single_unitig():
    # One read twice: every k-mer has count 2 -> all solid.
    read = rand_genome(60)
    res = assemble([read, read], cfg(k=25), write_output=False)
    straights, junctions, links = parse(res.gfa_lines)
    assert len(straights) == 1
    assert len(junctions) == 2
    assert len(links) == 2
    # Chain = 36 - 2 nodes -> sequence length 58 = read minus one base per
    # terminal junction.
    s = straights[0]
    assert len(s) == 58
    assert s in read or revcomp_str(s) in read
    # Junctions are the terminal k-mers.
    want = {canonical_str(read[:25]), canonical_str(read[-25:])}
    assert {canonical_str(j) for j in junctions} == want
    for l in links:
        assert l[4] == "24M"


def test_linear_genome_oracle():
    genome = rand_genome(2000)
    reads = tiled_reads(genome, 250, 50)
    res = assemble(reads, cfg(k=25, chunk_len=512), write_output=False)
    straights, junctions, links = parse(res.gfa_lines)
    assert len(straights) == 1, (len(straights), [len(s) for s in straights])
    assert len(junctions) == 2
    assert len(links) == 2
    s = straights[0]
    assert s in genome or revcomp_str(s) in genome
    assert len(s) > 1500  # spans most of the genome (thin ends trimmed)


def test_branch_makes_junction():
    # Two "alleles" sharing a prefix: prefix + A-branch / prefix + B-branch.
    prefix = rand_genome(80)
    a = prefix + rand_genome(60)
    b = prefix + rand_genome(60)
    reads = [a, a, b, b]
    res = assemble(reads, cfg(k=25), write_output=False)
    straights, junctions, links = parse(res.gfa_lines)
    # One shared unitig + two branch unitigs; >= 3 junctions (branch point
    # + 3 dead ends can merge in various ways, but the branch node must
    # exist: a k-mer with 2 right neighbors).
    assert len(straights) == 3
    assert len(junctions) >= 3
    # The branch junction's k-mer is the last shared k-mer.
    shared_last = canonical_str(prefix[-25:] if len(prefix) >= 25 else a[:25])
    assert any(canonical_str(j) == shared_last for j in junctions)


def test_circular_genome():
    # A circular genome: every k-mer (1,1) -> one circular unitig, no
    # junctions.  (The reference's walker would never terminate here.)
    genome = rand_genome(300)
    circ = genome + genome[:100]  # reads wrap the origin
    reads = tiled_reads(circ, 120, 30)
    res = assemble(reads, cfg(k=25), write_output=False)
    straights, junctions, links = parse(res.gfa_lines)
    assert res.num_straights >= 1
    # The dominant unitig should cover the whole circle.
    assert max(len(s) for s in straights) >= 300
    circ_links = [l for l in links if l[0] == l[2]]
    assert len(circ_links) >= 1


def test_no_reads_shorter_than_k():
    reads = ["ACGT" * 4]  # length 16 < k
    res = assemble(reads, cfg(k=25), write_output=False)
    assert res.num_straights == 0
    assert res.num_junctions == 0


def test_restrict_to_seeds_off_keeps_everything():
    read = rand_genome(60)
    res = assemble([read, read], cfg(k=25, restrict_to_seeds=False),
                   write_output=False)
    straights, junctions, _ = parse(res.gfa_lines)
    assert len(straights) == 1 and len(junctions) == 2


def test_contig_fasta_export(tmp_path):
    from platanus3_tpu.io import gfa as gfa_mod
    read = rand_genome(120)
    res = assemble([read, read], cfg(k=25), write_output=False)
    path = tmp_path / "contigs.fasta"
    n = gfa_mod.write_contig_fasta(str(path), res.gfa_lines)
    text = path.read_text().splitlines()
    assert n == res.num_straights == 1
    assert text[0].startswith(">Straight_1 length=")
    # record sequence matches the GFA straight segment
    straights, _, _ = parse(res.gfa_lines)
    assert text[1] == straights[0]
    # min_len filters everything out
    assert gfa_mod.write_contig_fasta(str(path), res.gfa_lines,
                                      min_len=10**6) == 0
    # junctions included on request (k-mer records)
    lines = gfa_mod.contig_fasta_lines(res.gfa_lines,
                                       include_junctions=True)
    assert sum(1 for l in lines if l.startswith(">Junction_")) == 2
