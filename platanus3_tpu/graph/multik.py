"""Multi-k iterative assembly (BASELINE config 4).

NEW capability with no reference counterpart: assemble at increasing k
(e.g. 32 -> 64 -> 128), re-seeding each round's graph with the previous
round's unitigs.  Small k recovers low-coverage regions; large k resolves
repeats.  Re-seeding works by injecting each unitig as ``cov_threshold``
pseudo-read copies, so every k-mer on a previously-assembled unitig passes
the solidity filter at the next k even where raw read coverage is thin --
the standard IDBA/SPAdes-style multi-k scheme expressed through this
framework's existing solidity machinery.
"""

from __future__ import annotations

import dataclasses

from platanus3_tpu.config import AssemblyConfig
from platanus3_tpu.io import reads as reads_mod
from platanus3_tpu.pipeline import assemble, AssemblyResult

__all__ = ["assemble_multik"]


def assemble_multik(source, config: AssemblyConfig, log=None, mesh=None,
                    write_output: bool = True) -> AssemblyResult:
    ks = tuple(config.k_list) or (config.k,)
    if isinstance(source, (list, tuple)):
        reads = list(source)
    else:
        reads = reads_mod.parse_reads(source)

    res = None
    for i, k in enumerate(ks):
        cfg_k = dataclasses.replace(config, k=k, k_list=())
        pseudo = list(reads)
        if res is not None:
            for seq in res.straight_seqs:
                if len(seq) >= k:
                    pseudo.extend([seq] * config.cov_threshold)
        last = i == len(ks) - 1
        res = assemble(pseudo, cfg_k, log=log, mesh=mesh,
                       write_output=write_output and last)
        if log:
            log.write(f"multi-k round k={k}: {res.num_straights} straights, "
                      f"{res.num_junctions} junctions")
    return res
