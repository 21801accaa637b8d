"""Seed-component reachability on the contracted graph.

The reference materializes only what its seed-driven BFS visits
(``MakeDBG``, reference ``src/DeBruijnGraph.cpp:93-155``): traversal from
each read's first solid k-mer floods the whole connected component.  The
array-native equivalent is a connected-component flood on the CONTRACTED
graph (junction nodes + unitigs as vertices), which is tiny compared to
the k-mer graph, so an iterate-until-fixpoint flood is cheap: each round
propagates "reached" across junction<->junction and junction<->unitig
edges; rounds needed = contracted-graph diameter (1 for a clean genome).

Vertices: ``v in [0, M)`` junction-final nodes; ``M + uid`` unitigs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from platanus3_tpu.graph.build import DBG
from platanus3_tpu.ops import count as count_mod
from platanus3_tpu.ops import kmer as kmer_mod

__all__ = ["reachable"]


def _edge_targets(dbg: DBG):
    """[M, 8] contracted-vertex target of each junction edge (-1 none).

    For a junction's present neighbor: the neighbor node is a junction
    (vertex = its id) or a chain member (vertex = M + uid of its chain; a
    chain node adjacent to a junction is necessarily a chain END, but any
    member state carries the uid).  Neighbors absent from the node table
    (Bloom false positives) have no vertex.
    """
    m = dbg.nodes.shape[0]
    nid = jnp.concatenate([dbg.left_id, dbg.right_id], axis=1)     # [M, 8]
    present = jnp.concatenate([dbg.left_present, dbg.right_present], axis=1)
    nidc = jnp.clip(nid, 0, m - 1)
    n_jun = dbg.is_junction_final[nidc]
    n_uid = jnp.maximum(dbg.node_state_uid[nidc, 0], dbg.node_state_uid[nidc, 1])
    tgt = jnp.where(n_jun, nidc, jnp.where(n_uid >= 0, m + n_uid, -1))
    tgt = jnp.where(present & (nid >= 0), tgt, -1)
    # Only junction rows emit edges.
    return jnp.where(dbg.is_junction_final[:, None], tgt, -1)


def reachable(dbg: DBG, seed_fw: jnp.ndarray, has_seed: jnp.ndarray, k: int,
              max_rounds: int = 0):
    """-> (reach_junction [M] bool, reach_unitig [2M] bool).

    ``seed_fw [R, L]``: per-read seed k-mers in forward orientation
    (``src/MakeBloomFilter.cpp:79-83``); flood starts from the vertices
    containing them.
    """
    m, l = dbg.nodes.shape
    nv = 3 * m  # m junction slots + 2m unitig slots

    canon, _ = kmer_mod.canonical(seed_fw, k)
    table = count_mod.KmerTable(dbg.nodes, jnp.zeros((m,), jnp.int32),
                                dbg.size)
    sid = count_mod.lookup_id(table, canon)
    sid = jnp.where(has_seed, sid, -1)
    sidc = jnp.clip(sid, 0, m - 1)
    s_uid = jnp.maximum(dbg.node_state_uid[sidc, 0],
                        dbg.node_state_uid[sidc, 1])
    s_vert = jnp.where(dbg.is_junction_final[sidc], sidc,
                       jnp.where(s_uid >= 0, m + s_uid, -1))
    s_vert = jnp.where(sid >= 0, s_vert, -1)

    reach = jnp.zeros((nv,), bool).at[
        jnp.where(s_vert >= 0, s_vert, nv)
    ].set(True, mode="drop")

    tgt = _edge_targets(dbg)                     # [M, 8]
    src = jnp.broadcast_to(jnp.arange(m)[:, None], (m, 8))
    e_src = src.reshape(-1)
    e_tgt = tgt.reshape(-1)
    e_ok = e_tgt >= 0
    e_tgt_c = jnp.clip(e_tgt, 0, nv - 1)

    def body(state):
        reach, _ = state
        new = reach
        # junction -> neighbor
        new = new.at[jnp.where(e_ok & reach[e_src], e_tgt_c, nv)].set(
            True, mode="drop")
        # neighbor -> junction
        back = e_ok & new[e_tgt_c]
        new = new.at[jnp.where(back, e_src, nv)].set(True, mode="drop")
        changed = jnp.any(new != reach)
        return new, changed

    def cond(state):
        return state[1]

    reach, _ = jax.lax.while_loop(cond, lambda s: body(s), (reach, True))
    reach_junction = reach[:m] & dbg.is_junction_final
    reach_unitig = reach[m:]
    return reach_junction, reach_unitig
