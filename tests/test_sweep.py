"""Solid-threshold sweep on error-prone reads (BASELINE config 2).

Verifies the simulator's error model, and that the single-pass sweep's
precision/recall behave as the solidity theory predicts: at adequate
coverage, raising the threshold prunes error k-mers (precision rises to
~1) before it starts losing true k-mers (recall stays high), and the best
threshold assembles the error-prone reads into the same unitig structure
as clean reads would.
"""

import numpy as np
import pytest

from platanus3_tpu import sim
from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.sweep import n50, solid_threshold_sweep


def cfg(k=25, **kw):
    kw.setdefault("chunk_len", 256)
    kw.setdefault("gfa_path", "/tmp/test_sweep.gfa")
    kw.setdefault("log_path", None)
    return AssemblyConfig(k=k, **kw)


def test_simulator_error_rates():
    g = sim.random_genome(2000, seed=1)
    reads = sim.simulate_reads(g, coverage=1.0, read_len=2000, seed=2,
                               sub_rate=0.05)
    # Substitution-only: length preserved, ~5% mismatches vs genome (for
    # the non-RC read orientation, compare directly).
    r = reads[0]
    if len(r) == 2000:
        mism = sum(a != b for a, b in zip(r, g))
        rc_mism = sum(a != b for a, b in zip(sim.revcomp(r), g))
        assert min(mism, rc_mism) / 2000 == pytest.approx(0.05, abs=0.02)
    reads_id = sim.simulate_reads(g, coverage=1.0, read_len=500, seed=3,
                                  ins_rate=0.03, del_rate=0.03)
    lens = [len(r) for r in reads_id]
    assert all(400 < x < 600 for x in lens)


def test_sweep_precision_recall_monotone():
    g = sim.random_genome(3000, seed=10)
    reads = sim.simulate_reads(g, coverage=30, read_len=300, seed=11,
                               sub_rate=0.01)
    rows = solid_threshold_sweep(reads, cfg(), range(1, 8), truth_genome=g)
    prec = [r["precision"] for r in rows]
    rec = [r["recall"] for r in rows]
    n_solid = [r["n_solid"] for r in rows]
    # solid set shrinks with threshold; precision weakly increases
    assert all(a >= b for a, b in zip(n_solid, n_solid[1:]))
    assert all(b >= a - 1e-9 for a, b in zip(prec, prec[1:]))
    # threshold 1 admits error k-mers (low precision); a mid threshold is
    # nearly pure and still near-complete at 30x
    assert prec[0] < 0.9
    best = max(rows, key=lambda r: r["f1"])
    assert best["precision"] > 0.98
    assert best["recall"] > 0.95
    # recall never increases with threshold
    assert all(b <= a + 1e-9 for a, b in zip(rec, rec[1:]))


def test_sweep_assembly_recovers_genome():
    g = sim.random_genome(2000, seed=20)
    reads = sim.simulate_reads(g, coverage=40, read_len=250, seed=21,
                               sub_rate=0.005)
    rows = solid_threshold_sweep(reads, cfg(), [2, 4, 6], truth_genome=g,
                                 assemble_each=True)
    best = max(rows, key=lambda r: r["f1"])
    # At the F1-best threshold the assembly is a near-full-genome unitig.
    assert best["max_unitig"] > 0.9 * len(g)
    assert best["straights"] <= 4
    # n50 helper sanity
    assert n50([10, 10, 10]) == 10
    assert n50([50, 30, 20]) == 50
    assert n50([]) == 0


def test_mutate_genome_bubble_source():
    g = sim.random_genome(1000, seed=30)
    g2 = sim.mutate_genome(g, 3, seed=31, min_gap=100)
    diff = [i for i, (a, b) in enumerate(zip(g, g2)) if a != b]
    assert len(diff) == 3
    assert all(diff[i + 1] - diff[i] >= 100 for i in range(len(diff) - 1))


def test_plant_repeats():
    g = sim.random_genome(5000, seed=40)
    g2 = sim.plant_repeats(g, repeat_len=50, n_copies=4, seed=41)
    assert len(g2) == len(g)
    # find the repeat: it appears at >= 4 loci
    # (reconstruct from the first difference region is overkill; just count
    # occurrences of each planted window by brute force on a 50-mer that
    # occurs multiple times)
    from collections import Counter
    c = Counter(g2[i:i+50] for i in range(len(g2) - 49))
    assert c.most_common(1)[0][1] >= 4
