"""Golden equality tests against the compiled reference binary.

SURVEY.md §4: the reference is CPU-runnable and acts as the oracle.
Comparison contract (BASELINE.md): straight/junction SEQUENCE multisets up
to reverse-complement canonicalization; ids are traversal-order dependent
and never compared.  The Bloom size must be pinned (``-m``) because the
reference's default sizing saturates on clean data (verified failure
mode); with a generous pinned size both sides' false-positive effects are
negligible and the graphs must agree exactly.

The reference binary is built once per session from /root/reference into
/tmp (skip if no compiler).  It always writes ./de_bruijn_graph.gfa and
./platanus3.log into the CWD, so runs are isolated per-test in tmp dirs.
"""

import os
import shutil
import subprocess
from collections import Counter

import numpy as np
import pytest

from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.constants import BASES, canonical_str
from platanus3_tpu.pipeline import assemble

REF_SRC = "/root/reference"
REF_BIN = "/tmp/refbuild/platanus3"

RNG = np.random.default_rng(11)


def _ensure_ref():
    if os.path.exists(REF_BIN):
        return True
    if not os.path.exists(REF_SRC) or shutil.which("g++") is None:
        return False
    os.makedirs("/tmp/refbuild", exist_ok=True)
    subprocess.run(f"cp -r {REF_SRC}/* /tmp/refbuild/", shell=True, check=True)
    r = subprocess.run(["make"], cwd="/tmp/refbuild", capture_output=True)
    return r.returncode == 0


needs_ref = pytest.mark.skipif(not _ensure_ref(),
                               reason="reference binary unavailable")


def run_reference(reads, k, m_bits, tmpdir, timeout=300):
    fasta = os.path.join(tmpdir, "reads.fasta")
    with open(fasta, "w") as f:
        for i, s in enumerate(reads):
            f.write(f">r{i}\n{s}\n")
    subprocess.run(
        [REF_BIN, "-i", fasta, "-k", str(k), "-m", str(m_bits), "-t", "4"],
        cwd=tmpdir, check=True, capture_output=True, timeout=timeout)
    return parse_gfa(os.path.join(tmpdir, "de_bruijn_graph.gfa"))


def parse_gfa(path):
    straights, junctions, links = [], [], 0
    with open(path) as f:
        for ln in f:
            fields = ln.rstrip("\n").split("\t")
            if fields[0] == "S":
                seq = canonical_str(fields[2])
                if fields[1].startswith("Straight"):
                    straights.append(seq)
                else:
                    junctions.append(seq)
            elif fields[0] == "L":
                links += 1
    return Counter(straights), Counter(junctions), links


def run_ours(reads, k, m_bits):
    cfg = AssemblyConfig(k=k, filter_bits=m_bits, chunk_len=512,
                         log_path=None)
    res = assemble(list(reads), cfg, write_output=False)
    straights = Counter(canonical_str(s) for s in res.straight_seqs
                        if res.gfa_lines)  # all emitted seqs
    # Re-parse from GFA lines to honor reachability filtering exactly.
    straights, junctions = Counter(), Counter()
    links = 0
    for ln in res.gfa_lines:
        fields = ln.split("\t")
        if fields[0] == "S":
            seq = canonical_str(fields[2])
            if fields[1].startswith("Straight"):
                straights[seq] += 1
            else:
                junctions[seq] += 1
        elif fields[0] == "L":
            links += 1
    return straights, junctions, links


def rand_genome(n, rng=RNG):
    return "".join(rng.choice(list(BASES), size=n))


def tiled_reads(genome, read_len, step):
    return [genome[s : s + read_len]
            for s in range(0, len(genome) - read_len + 1, step)]


@needs_ref
@pytest.mark.parametrize("glen,k", [(1000, 25), (3000, 25), (3000, 21)])
def test_clean_genome_matches_reference(glen, k, tmp_path):
    genome = rand_genome(glen)
    reads = tiled_reads(genome, 200, 40)
    m = 1 << 22
    ref_s, ref_j, ref_l = run_reference(reads, k, m, str(tmp_path))
    our_s, our_j, our_l = run_ours(reads, k, m)
    assert our_s == ref_s
    assert our_j == ref_j
    assert our_l == ref_l


@needs_ref
def test_branching_genome_matches_reference(tmp_path):
    # Shared core with two divergent arms on each side -> junctions.
    rng = np.random.default_rng(13)
    core = rand_genome(400, rng)
    armA, armB = rand_genome(200, rng), rand_genome(200, rng)
    armC, armD = rand_genome(200, rng), rand_genome(200, rng)
    h1 = armA + core + armC
    h2 = armB + core + armD
    reads = tiled_reads(h1, 150, 30) + tiled_reads(h2, 150, 30)
    m = 1 << 22
    ref_s, ref_j, ref_l = run_reference(reads, 25, m, str(tmp_path))
    our_s, our_j, our_l = run_ours(reads, 25, m)
    assert our_s == ref_s
    assert our_j == ref_j


@needs_ref
def test_repeat_genome_matches_reference(tmp_path):
    # A repeated segment creates real junctions and multiple unitigs.
    rng = np.random.default_rng(17)
    rep = rand_genome(120, rng)
    genome = (rand_genome(500, rng) + rep + rand_genome(500, rng)
              + rep + rand_genome(500, rng))
    reads = tiled_reads(genome, 180, 35)
    m = 1 << 22
    ref_s, ref_j, ref_l = run_reference(reads, 25, m, str(tmp_path))
    our_s, our_j, our_l = run_ours(reads, 25, m)
    assert our_s == ref_s
    assert our_j == ref_j
