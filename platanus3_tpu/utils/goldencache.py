"""Fingerprinting for cached reference-binary golden runs.

Golden tests and benchmarks reuse a pre-run reference GFA (the binary is
the wall-clock bottleneck, so ``tools/gen_golden_inputs.py`` lets it run
in the background).  A stale or mismatched cached GFA would silently
corrupt the golden oracle (false pass or false fail) -- so the cache is
only trusted when a ``golden.fp`` file next to it matches the sha256 of
the exact FASTA text plus the (k, m) parameters of the comparison
(ADVICE r3).
"""

from __future__ import annotations

import hashlib
import os

__all__ = ["reads_fingerprint", "write_fingerprint", "cached_ref_gfa"]

GFA_NAME = "de_bruijn_graph.gfa"
FP_NAME = "golden.fp"


def _fasta_text(reads) -> str:
    return "".join(f">r{i}\n{s}\n" for i, s in enumerate(reads))


def reads_fingerprint(reads, k: int, m_bits: int) -> str:
    h = hashlib.sha256(_fasta_text(reads).encode())
    h.update(f"|k={k}|m={m_bits}".encode())
    return h.hexdigest()


def write_fingerprint(ref_dir: str, reads, k: int, m_bits: int) -> None:
    os.makedirs(ref_dir, exist_ok=True)
    with open(os.path.join(ref_dir, FP_NAME), "w") as f:
        f.write(reads_fingerprint(reads, k, m_bits) + "\n")


def cached_ref_gfa(ref_dir: str, reads, k: int, m_bits: int):
    """Path to a trusted cached reference GFA, or None.

    Trusted = the GFA exists AND ``golden.fp`` in the same directory
    matches the fingerprint of (reads, k, m).  A GFA without a
    fingerprint is never trusted.
    """
    gfa = os.path.join(ref_dir, GFA_NAME)
    fp = os.path.join(ref_dir, FP_NAME)
    if not (os.path.exists(gfa) and os.path.exists(fp)):
        return None
    with open(fp) as f:
        stored = f.read().strip()
    if stored != reads_fingerprint(reads, k, m_bits):
        return None
    return gfa
