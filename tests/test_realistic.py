"""Realistic genome structure (VERDICT r3 item 6).

Uniform-random genomes have no GC skew, homopolymer runs, low-complexity
tracts, or tandem repeats -- the features that stress canonical-k-mer
pipelines (palindrome density, window-min ties, Bloom/hash load skew).
``sim.realistic_genome`` composites all of them; these tests pin the
generator's properties and hold the golden gate against the reference
binary on such a genome.
"""

import re

import numpy as np
import pytest

from platanus3_tpu import sim
from tests.test_golden import needs_ref, run_reference, run_ours, tiled_reads
from tests.test_golden_deep import parse_gfa_deep, run_reference_deep, \
    run_ours_deep


def test_gc_skewed_composition():
    g = sim.gc_skewed_genome(200_000, gc=0.65, seed=3)
    assert len(g) == 200_000
    gc = (g.count("G") + g.count("C")) / len(g)
    assert 0.63 < gc < 0.67
    at = (g.count("A") + g.count("T")) / len(g)
    assert abs(gc + at - 1.0) < 1e-9


def test_homopolymer_runs_planted():
    g = sim.plant_homopolymers("ACGT" * 5000, 40, min_len=10, max_len=20,
                               seed=1)
    runs = re.findall(r"A{10,}|C{10,}|G{10,}|T{10,}", g)
    assert len(runs) >= 20  # some overwrite each other; most survive
    assert len(g) == 20_000


def test_tandem_repeats_planted():
    base = sim.random_genome(50_000, seed=4)
    g = sim.plant_tandem_repeats(base, 25, unit_min=3, unit_max=6,
                                 copies_min=8, copies_max=12, seed=5)
    assert len(g) == len(base)
    # at least one locus should show a unit repeated >= 6 times
    assert re.search(r"(.{3,6})\1{5,}", g)


def test_realistic_genome_composition():
    g = sim.realistic_genome(300_000, seed=11, gc=0.6)
    assert len(g) == 300_000
    gc = (g.count("G") + g.count("C")) / len(g)
    assert 0.55 < gc < 0.65  # skew survives the planted features
    assert re.search(r"A{8,}|C{8,}|G{8,}|T{8,}", g)  # homopolymers exist
    assert re.search(r"(.{2,12})\1{3,}", g)          # tandem tracts exist


@needs_ref
def test_realistic_genome_matches_reference(tmp_path):
    """Golden equality on a structurally realistic genome: GC skew,
    homopolymers, tandem tracts, dispersed repeats -- not uniform-random.
    """
    g = sim.realistic_genome(20_000, seed=21, gc=0.62,
                             homopolymers_per_mb=2000,
                             tandems_per_mb=1000,
                             dispersed_repeat_len=120,
                             dispersed_per_mb=400)
    reads = tiled_reads(g, 400, 60)
    m = 1 << 22
    ref_s, ref_j, ref_l = run_reference(reads, 25, m, str(tmp_path))
    our_s, our_j, our_l = run_ours(reads, 25, m)
    assert our_s == ref_s
    assert our_j == ref_j
    assert our_l == ref_l


@needs_ref
def test_palindromic_tract_links_match_reference(tmp_path):
    """RC-palindromic unitig sequences ((ACGT)^n tracts, G^n C^n runs)
    make the GFA sign of a link endpoint meaningless -- the sequence
    reads the same both ways.  Both sides must agree on the full DEEP
    contract (S, junction KC, canonicalized L multisets) under the
    palindromic-sign normalization (test_golden_deep._pin; found by the
    round-4 realistic 2 Mb golden: 5/15,980 links differed only in such
    a sign)."""
    rng = np.random.default_rng(41)
    u = lambda n: "".join(rng.choice(list("ACGT"), size=n))
    genome = (u(600) + "TACG" * 12 + u(600) + "G" * 22 + "C" * 22
              + u(600) + "CCCTAGGGTA" * 5 + u(600))
    reads = tiled_reads(genome, 300, 40)
    m = 1 << 22
    ref = run_reference_deep(reads, 25, m, str(tmp_path))
    ours = run_ours_deep(reads, 25, m)
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]
    assert ours[2] == ref[2]


@needs_ref
def test_realistic_errorprone_matches_reference(tmp_path):
    """Same genome class + substitution errors and both-strand reads --
    the solidity filter now does real work over skewed composition."""
    g = sim.realistic_genome(12_000, seed=23, gc=0.58,
                             homopolymers_per_mb=2000,
                             tandems_per_mb=1000,
                             dispersed_repeat_len=100,
                             dispersed_per_mb=300)
    reads = sim.simulate_reads(g, coverage=25, read_len=600, seed=24,
                               sub_rate=0.005)
    m = 1 << 22
    ref_s, ref_j, ref_l = run_reference(reads, 25, m, str(tmp_path))
    our_s, our_j, our_l = run_ours(reads, 25, m)
    assert our_s == ref_s
    assert our_j == ref_j
    assert our_l == ref_l
