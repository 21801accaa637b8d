"""GFA 1.0 output.

Reproduces the reference's output contract (``DeBruijnGraph::PrintGraph``,
reference ``src/DeBruijnGraph.cpp:451-544``):

* header ``H  VN:Z:1.0``
* ``S`` line per straight (unitig): name ``Straight_<id>``, sequence, tag
  ``KC:i:<len(sequence)>`` (yes -- the reference writes the LENGTH here,
  ``:459-461``);
* ``S`` line per junction: name ``Junction_<id>``, k-mer string, tag
  ``KC:i:<coverage * k>`` (``:463-465``);
* ``L`` lines emitted from junctions only, one per direction whose
  observed tally is > 0 AND whose neighbor is Bloom-recorded (``:470-473,
  509-512``), overlap ``(k-1)M``; target resolution order junction ->
  joint(straight); the sign is '+' when the neighbor was found under its
  stored orientation and '-' when under its reverse complement
  (``:486-505, 526-541``).  Joints are never emitted as segments and
  straight-straight links cannot occur (unitigs are always separated by
  junctions).

Differences by design: node ids here are dense and deterministic (the
reference's depend on thread scheduling; SURVEY.md §4 bans comparing
them); stored orientation is the canonical form (the reference's is
traversal-encounter order), so signs/sequences may be mirrored -- the
graphs are isomorphic up to reverse complement.  Circular unitigs (which
would hang the reference's walker) get a self-``L`` line.
"""

from __future__ import annotations

import numpy as np

from platanus3_tpu.ops import kmer as kmer_mod

__all__ = ["write_gfa", "gfa_lines"]


def gfa_lines(dbg_np, cov_np, seqs, reach_jun, reach_uni, k: int):
    """Build GFA lines (list of str) from host-side numpy pytrees."""
    m = dbg_np.nodes.shape[0]
    size = int(dbg_np.size)
    num_u = int(dbg_np.num_unitigs)
    is_jun = np.asarray(dbg_np.is_junction_final)[:size]
    joint_uid = np.asarray(dbg_np.joint_uid)
    node_cov = np.asarray(cov_np.node_cov)
    tally = np.asarray(cov_np.jun_tally)
    reach_jun = np.asarray(reach_jun)
    reach_uni = np.asarray(reach_uni)
    circular = np.asarray(dbg_np.unitig_circular)

    emit_jun = is_jun & reach_jun[:size]
    jun_nodes = np.nonzero(emit_jun)[0]
    jun_gfa_id = np.full(m, -1, dtype=np.int64)
    jun_gfa_id[jun_nodes] = np.arange(1, len(jun_nodes) + 1)

    emit_uni = reach_uni[:num_u] if num_u else np.zeros(0, bool)
    uni_nodes = np.nonzero(emit_uni)[0]
    uni_gfa_id = np.full(max(num_u, 1), -1, dtype=np.int64)
    uni_gfa_id[uni_nodes] = np.arange(1, len(uni_nodes) + 1)

    lines = ["H\tVN:Z:1.0"]

    for u in uni_nodes:
        lines.append(
            f"S\tStraight_{uni_gfa_id[u]}\t{seqs[u]}\tKC:i:{len(seqs[u])}")

    jun_strs = kmer_mod.decode_kmers_np(
        np.asarray(dbg_np.nodes)[jun_nodes], k) if len(jun_nodes) else []
    for v, s in zip(jun_nodes, jun_strs):
        lines.append(
            f"S\tJunction_{jun_gfa_id[v]}\t{s}\tKC:i:{int(node_cov[v]) * k}")

    lid = np.asarray(dbg_np.left_id)
    rid = np.asarray(dbg_np.right_id)
    lpres = np.asarray(dbg_np.left_present)
    rpres = np.asarray(dbg_np.right_present)
    lfw = np.asarray(dbg_np.left_isfw)
    rfw = np.asarray(dbg_np.right_isfw)
    is_jun_full = np.asarray(dbg_np.is_junction_final)

    def target_name(nid):
        """Resolve neighbor node -> GFA segment name, or None."""
        if nid < 0:
            return None
        if is_jun_full[nid]:
            gid = jun_gfa_id[nid]
            return f"Junction_{gid}" if gid > 0 else None
        uid = joint_uid[nid]
        if uid >= 0 and uni_gfa_id[uid] > 0:
            return f"Straight_{uni_gfa_id[uid]}"
        return None

    ov = f"{k - 1}M"
    for v in jun_nodes:
        me = f"Junction_{jun_gfa_id[v]}"
        for b in range(4):  # left directions (cols 0-3)
            if tally[v, b] == 0 or not lpres[v, b]:
                continue
            name = target_name(lid[v, b])
            if name is None:
                continue
            sign = "+" if lfw[v, b] else "-"
            lines.append(f"L\t{name}\t{sign}\t{me}\t+\t{ov}")
        for b in range(4):  # right directions (cols 4-7)
            if tally[v, 4 + b] == 0 or not rpres[v, b]:
                continue
            name = target_name(rid[v, b])
            if name is None:
                continue
            sign = "+" if rfw[v, b] else "-"
            lines.append(f"L\t{me}\t+\t{name}\t{sign}\t{ov}")

    for u in uni_nodes:
        if circular[u]:
            name = f"Straight_{uni_gfa_id[u]}"
            lines.append(f"L\t{name}\t+\t{name}\t+\t{ov}")

    return lines


def write_gfa(path, dbg_np, cov_np, seqs, reach_jun, reach_uni, k: int):
    lines = gfa_lines(dbg_np, cov_np, seqs, reach_jun, reach_uni, k)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)
