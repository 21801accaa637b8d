"""Deep golden parity vs the reference binary: coverage VALUES and links.

VERDICT r1 items 4/5: the round-1 goldens compared S-sequence multisets
only; here the junction ``KC:i:<coverage*k>`` tags (reference
``src/DeBruijnGraph.cpp:463-465``, coverage accumulated by
``CountNodeCoverage``, ``:393-449``) and the full L-line multisets
(``:468-543``) are compared too, on clean AND error-prone reads.

Both sides may store a segment in either orientation (ids and
orientations are traversal-dependent), so:

* a junction is identified by its CANONICAL k-mer string, compared as a
  multiset of (canonical_kmer, KC_value);
* a link is normalized by (a) canonicalizing each endpoint sequence and
  flipping its sign when the stored sequence was reverse-complemented,
  then (b) taking the lexicographic min of the link and its
  reverse-complement dual (B,-ob)->(A,-oa) -- two GFA L lines denote the
  same de Bruijn edge iff they normalize equally.

This adjudicates the +1-vs-+2 coverage question (VERDICT r1 missing #2):
the reference calls ``AddNodeCoverage(kmer_Fw)`` AND ``(kmer_Bw)`` per
position (``:402-404, 420-422``) against maps keyed by ONE stored
orientation, so a position contributes +1 (+2 only for palindromes,
impossible at odd k) -- which is what graph/coverage.py implements; the
KC equality assertions prove it against the binary.
"""

import os
from collections import Counter

import numpy as np
import pytest

from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.constants import canonical_str
from platanus3_tpu.pipeline import assemble
from platanus3_tpu import sim

from tests.test_golden import (REF_BIN, _ensure_ref, rand_genome,
                               tiled_reads, run_reference)
import subprocess

needs_ref = pytest.mark.skipif(not _ensure_ref(),
                               reason="reference binary unavailable")


def _flip(o):
    return "+" if o == "-" else "-"


def _norm_endpoint(seq, o):
    c = canonical_str(seq)
    if c != seq:
        o = _flip(o)
    return c, o


def _pin(seq, o):
    """An RC-PALINDROMIC segment (seq == revcomp(seq): even-length tandem
    tracts like (ACGT)^n, G^nC^n -- possible for whole unitig sequences
    even at odd k) reads identically in both orientations, so its GFA
    sign carries no information; both sides may legally emit either
    (the reference's sign comes from thread-order-dependent map probes,
    ``src/DeBruijnGraph.cpp:486-505``; ours is canonical-form based).
    Normalize to '+'.  First hit by realistic-genome goldens (round 4:
    5 of 15,980 links differed only in such a sign)."""
    from platanus3_tpu.sim import revcomp
    return (seq, "+") if seq == revcomp(seq) else (seq, o)


def canon_link(seq_a, o_a, seq_b, o_b):
    a = _norm_endpoint(seq_a, o_a)
    b = _norm_endpoint(seq_b, o_b)
    fwd = _pin(*a) + _pin(*b)
    dual = _pin(b[0], _flip(b[1])) + _pin(a[0], _flip(a[1]))
    return min(fwd, dual)


def parse_gfa_deep(lines):
    """(straight multiset, junction (kmer, KC) multiset, link multiset)."""
    name_seq = {}
    jun_kc = Counter()
    straights = Counter()
    raw_links = []
    for ln in lines:
        f = ln.rstrip("\n").split("\t")
        if f[0] == "S":
            name_seq[f[1]] = f[2]
            kc = int(f[3].split(":")[-1])
            if f[1].startswith("Straight"):
                straights[canonical_str(f[2])] += 1
            else:
                jun_kc[(canonical_str(f[2]), kc)] += 1
        elif f[0] == "L":
            raw_links.append((f[1], f[2], f[3], f[4]))
    links = Counter(
        canon_link(name_seq[a], oa, name_seq[b], ob)
        for a, oa, b, ob in raw_links)
    return straights, jun_kc, links


def run_reference_deep(reads, k, m_bits, tmpdir):
    fasta = os.path.join(tmpdir, "reads.fasta")
    with open(fasta, "w") as f:
        for i, s in enumerate(reads):
            f.write(f">r{i}\n{s}\n")
    subprocess.run(
        [REF_BIN, "-i", fasta, "-k", str(k), "-m", str(m_bits), "-t", "4"],
        cwd=tmpdir, check=True, capture_output=True, timeout=600)
    with open(os.path.join(tmpdir, "de_bruijn_graph.gfa")) as f:
        return parse_gfa_deep(f.readlines())


def run_ours_deep(reads, k, m_bits, membership="exact",
                  filter_policy="safe"):
    cfg = AssemblyConfig(k=k, filter_bits=m_bits, chunk_len=512,
                         log_path=None,
                         use_exact_membership=(membership == "exact"),
                         filter_policy=filter_policy)
    res = assemble(list(reads), cfg, write_output=False)
    return parse_gfa_deep(res.gfa_lines)


@needs_ref
def test_junction_kc_and_links_branching(tmp_path):
    """Branching genome: junction coverage values and link sets match."""
    rng = np.random.default_rng(23)
    core = rand_genome(400, rng)
    arms = [rand_genome(200, rng) for _ in range(4)]
    h1 = arms[0] + core + arms[2]
    h2 = arms[1] + core + arms[3]
    reads = tiled_reads(h1, 150, 30) + tiled_reads(h2, 150, 30)
    m = 1 << 22
    ref = run_reference_deep(reads, 25, m, str(tmp_path))
    ours = run_ours_deep(reads, 25, m)
    assert ours[0] == ref[0]          # straight sequences
    assert ours[1] == ref[1]          # junction (kmer, KC) values
    assert ours[2] == ref[2]          # canonicalized L multiset


@needs_ref
def test_junction_kc_and_links_repeat(tmp_path):
    rng = np.random.default_rng(29)
    rep = rand_genome(120, rng)
    genome = (rand_genome(500, rng) + rep + rand_genome(500, rng)
              + rep + rand_genome(500, rng))
    reads = tiled_reads(genome, 180, 35)
    m = 1 << 22
    ref = run_reference_deep(reads, 25, m, str(tmp_path))
    ours = run_ours_deep(reads, 25, m)
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]
    assert ours[2] == ref[2]


@needs_ref
def test_error_prone_reads_match_reference(tmp_path):
    """Noisy-read solidity parity (VERDICT r1 missing #5): substitution
    errors exercise the window-min threshold path
    (``src/MakeBloomFilter.cpp:24-89``); both sides count exactly, so
    graphs must still agree with a generous pinned filter."""
    genome = sim.random_genome(3000, seed=31)
    reads = sim.simulate_reads(genome, coverage=30, read_len=300, seed=32,
                               sub_rate=0.01)
    m = 1 << 22
    ref = run_reference_deep(reads, 25, m, str(tmp_path))
    ours = run_ours_deep(reads, 25, m)
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]
    assert ours[2] == ref[2]


@needs_ref
def test_bloom_membership_safe_matches_reference(tmp_path):
    """End-to-end ``--membership bloom`` parity (VERDICT r1 missing #1):
    with the SAFE sizing policy (FPR ~1e-6) false positives are absent on
    both sides, so the Bloom-membership pipeline must reproduce the
    reference binary exactly -- validating that traversal driven by the
    filter (reference ``src/DeBruijnGraph.cpp:317-345``) rather than the
    exact node table leaves the output unchanged."""
    rng = np.random.default_rng(37)
    core = rand_genome(300, rng)
    h1 = rand_genome(150, rng) + core + rand_genome(150, rng)
    h2 = rand_genome(150, rng) + core + rand_genome(150, rng)
    reads = tiled_reads(h1, 150, 30) + tiled_reads(h2, 150, 30)
    m = 1 << 22
    ref = run_reference_deep(reads, 25, m, str(tmp_path))
    ours = run_ours_deep(reads, 25, m, membership="bloom")
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]
    assert ours[2] == ref[2]


@needs_ref
def test_error_prone_bloom_matches_reference(tmp_path):
    genome = sim.random_genome(2000, seed=41)
    reads = sim.simulate_reads(genome, coverage=30, read_len=250, seed=42,
                               sub_rate=0.01)
    m = 1 << 22
    ref = run_reference_deep(reads, 25, m, str(tmp_path))
    ours = run_ours_deep(reads, 25, m, membership="bloom")
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]
    assert ours[2] == ref[2]


def test_bloom_fp_neighbors_become_nodes():
    """A deliberately tiny filter forces false positives; the Bloom-mode
    closure must materialize them as real coverage-0 nodes, as the
    reference's traversal does (every Bloom-positive neighbor is enqueued
    and added, ``src/DeBruijnGraph.cpp:167-179``) -- the capability
    VERDICT r1 flagged as missing."""
    genome = sim.random_genome(1500, seed=51)
    reads = sim.simulate_reads(genome, coverage=25, read_len=200, seed=52)
    exact = AssemblyConfig(k=25, chunk_len=512, log_path=None)
    res_exact = assemble(list(reads), exact, write_output=False)

    cfg = AssemblyConfig(k=25, chunk_len=512, log_path=None,
                         use_exact_membership=False,
                         filter_bits=1 << 12, num_hashes=2)
    res = assemble(list(reads), cfg, write_output=False)
    # FP neighbors must have been added as nodes beyond the solid set.
    assert res.num_nodes > res.stats["solid_nodes"]
    assert res.num_nodes > res_exact.num_nodes
    # Phantom nodes are never observed in reads: coverage-0 junctions
    # appear in the GFA (KC:i:0) -- like the reference's FP nodes.
    kc0 = [ln for ln in res.gfa_lines
           if ln.startswith("S\tJunction") and ln.endswith("KC:i:0")]
    assert kc0, "expected coverage-0 phantom junction segments"


def test_reference_filter_policy_runs_end_to_end():
    """``filter_policy='reference'`` (the ``Options.cpp:50-60`` sizing,
    which assumes only error k-mers enter the filter) exercised end to
    end in Bloom mode.  On clean data the filter saturates and the graph
    shatters (the reference's verified failure mode, BASELINE.md); exact
    equality with the binary is impossible in the FP regime because the
    two implementations hash differently (different FP SETS), so this
    asserts the qualitative contract: the run completes and produces a
    more fragmented graph than exact membership."""
    genome = sim.random_genome(2000, seed=43)
    reads = sim.simulate_reads(genome, coverage=25, read_len=250, seed=44,
                               sub_rate=0.0)
    exact = run_ours_deep(reads, 25, 1 << 22, membership="exact")
    cfg = AssemblyConfig(k=25, chunk_len=512, log_path=None,
                         use_exact_membership=False,
                         filter_policy="reference")
    res = assemble(list(reads), cfg, write_output=False)
    frag = parse_gfa_deep(res.gfa_lines)
    n_exact = sum(exact[0].values()) + sum(exact[1].values())
    n_frag = sum(frag[0].values()) + sum(frag[1].values())
    assert n_frag >= n_exact
