"""Unitig sequence assembly (device char arrays -> host strings).

The reference spells a unitig during its walk by concatenating one base
per step plus the seed k-mer (``SearchNode``'s left_part + kmer +
right_part, reference ``src/DeBruijnGraph.cpp:183-223``).  Array-native
version: every kept chain member state knows its unitig id and position
(graph/build.py), and contributes exactly one character -- the LAST base
of its k-mer in the traversal orientation; the chain head contributes its
whole k-mer.  Sequence length is ``k + n - 1`` for an n-node chain, which
equals the reference's ``left_part + k + right_part``.

Device produces flat (uid, pos, char) triples; the host lexsorts once and
joins -- output-stage work, O(total unitig length).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from platanus3_tpu.constants import BASES
from platanus3_tpu.graph.build import DBG
from platanus3_tpu.ops import kmer as kmer_mod

__all__ = ["member_chars", "unitig_sequences"]


def member_chars(dbg: DBG, k: int) -> jnp.ndarray:
    """[M, 2] uint32 char code contributed by each node state.

    o=0 (canonical orientation): last base of the canonical k-mer;
    o=1: last base of the reverse complement = complement of first base.
    """
    lastb = kmer_mod.last_base(dbg.nodes, k)
    firstb = kmer_mod.first_base(dbg.nodes, k)
    return jnp.stack([lastb, np.uint32(3) - firstb], axis=1)


def unitig_sequences(dbg_np, chars_np: np.ndarray, k: int):
    """Host: assemble unitig strings.

    dbg_np: DBG pytree pulled to numpy.  Returns ``list[str]`` of length
    num_unitigs, index = unitig id.
    """
    m = dbg_np.nodes.shape[0]
    num_u = int(dbg_np.num_unitigs)
    if num_u == 0:
        return []
    heads = np.asarray(dbg_np.unitig_head[:num_u])
    lens = np.asarray(dbg_np.unitig_len[:num_u])

    # Head k-mers, decoded in traversal orientation.
    head_node = heads >> 1
    head_o = heads & 1
    head_kmers = np.asarray(dbg_np.nodes)[head_node]
    head_strs = kmer_mod.decode_kmers_np(head_kmers, k)
    from platanus3_tpu.constants import revcomp_str
    head_strs = [revcomp_str(s) if o else s for s, o in zip(head_strs, head_o)]

    # Flat member triples.
    uid = np.asarray(dbg_np.node_state_uid).reshape(-1)
    pos = np.asarray(dbg_np.node_state_pos).reshape(-1)
    ch = np.asarray(chars_np).reshape(-1)
    sel = (uid >= 0) & (pos >= 1)
    uid, pos, ch = uid[sel], pos[sel], ch[sel]
    order = np.lexsort((pos, uid))
    uid, pos, ch = uid[order], pos[order], ch[order]

    base_arr = np.frombuffer("ACGT".encode(), dtype=np.uint8)
    seqs = []
    # Member rows are grouped by uid in sorted order.
    bounds = np.searchsorted(uid, np.arange(num_u + 1))
    for u in range(num_u):
        lo, hi = bounds[u], bounds[u + 1]
        tail_chars = base_arr[ch[lo:hi]].tobytes().decode()
        assert hi - lo == lens[u] - 1, (u, hi - lo, lens[u])
        seqs.append(head_strs[u] + tail_chars)
    return seqs
