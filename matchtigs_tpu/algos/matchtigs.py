"""Optimal matchtigs: minimum plain-text representation with repetition.

Capability-equivalent of ``MatchtigAlgorithm``
(/root/reference/src/implementation/matchtigs/mod.rs:131-940):

1. imbalance scan; unbalanced self-mirrors get multiplicity 1 on both
   sides (mod.rs:176-191);
2. all-pairs k-bounded shortest paths between unbalanced nodes via the
   batched device kernel (replacing the threaded Dijkstra fan-out,
   mod.rs:321-541);
3. binodes expand into |imbalance| matching ids shared with their mirror
   (``GraphMatchingNodeMap``,
   /root/reference/src/implementation/mod.rs:188-250); candidate paths
   collapse to deduplicated id-pair edges (mod.rs:273-305);
4. the min-cost perfect matching on the doubled graph + 4 extra nodes per
   WCC (mod.rs:600-719) is solved equivalently but decomposed: matching
   constraints only bind within *candidate-graph* components (tiny even
   when the input graph is one giant component), and the per-input-WCC
   two free tig ends (what the 4 extras encode) are allocated across them
   exactly — zero-cost absorbers first, else a 2-unit knapsack over
   forced-deletion deltas (``_allocate_and_match``).  Components are
   solved exactly at any size with the in-process native sparse blossom
   (:mod:`matchtigs_tpu.ops.perfect_matching`) instead of the external
   blossom5 subprocess (mod.rs:724-746);
5. matched pairs become cheap dummy biedges; balancing, Eulerian
   decomposition and cycle breaking finish as usual (mod.rs:828-928).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..graph.bigraph import Bigraph
from ..ops import euler
from ..ops.matching import unbalanced_nodes
from .greedytigs import GreedytigConfig, SearchStats, collect_candidates

logger = logging.getLogger(__name__)


@dataclass
class MatchtigConfig:
    k: int
    initial_capacity: int = 16
    max_capacity: int = 1 << 16
    batch_size: int = 8192
    # If set, the collapsed matching instance and its solution are written
    # to <prefix>.matching / <prefix>.matching.solution — the durable
    # intermediate analog of the reference's blossom5 files
    # (<prefix>.minimalperfectmatching[.solution], matchtigs/mod.rs:600-603).
    matching_file_prefix: str | None = None
    # If set, candidate components up to this size are routed through the
    # independent dense O(n^3) blossom instead of the default sparse exact
    # solver (a perf/cross-check knob; both are exact).
    dense_limit: int | None = None
    # Threads for the native host Dijkstra (None = all cores), forwarded
    # to the internal GreedytigConfig (the reference's --threads reaches
    # both matchtig variants, src/bin.rs:147-149).
    host_threads: int | None = None
    # Opt-in per-source search counters; see GreedytigConfig.
    performance_counters: bool = False


def _matching_node_ids(g: Bigraph, diff: np.ndarray):
    """Assign |imbalance| consecutive matching ids per unbalanced binode
    class (shared between a node and its mirror), vectorized.

    Returns (ids_start [N], ids_count [N], total, reps, offsets): for node
    v its matching ids are ids_start[v] .. ids_start[v]+ids_count[v]-1.
    """
    mirror = g.mirror_node
    nodes = np.arange(g.n_nodes, dtype=np.int64)
    canon = np.minimum(nodes, mirror.astype(np.int64))
    counts = np.abs(diff).astype(np.int64)
    # both members of a class carry the same |diff|; scatter to the rep
    class_counts = np.zeros(g.n_nodes, dtype=np.int64)
    class_counts[canon] = counts  # either member writes the same value
    reps = np.flatnonzero(class_counts)
    offsets = np.zeros(len(reps) + 1, dtype=np.int64)
    np.cumsum(class_counts[reps], out=offsets[1:])
    rep_start = np.full(g.n_nodes, -1, dtype=np.int64)
    rep_start[reps] = offsets[:-1]
    ids_start = rep_start[canon]
    ids_count = class_counts[canon]
    return ids_start, ids_count, int(offsets[-1]), reps, offsets


def _collapse_candidates(
    g: Bigraph,
    candidates: np.ndarray,
    ids_start: np.ndarray,
    ids_count: np.ndarray,
    n_ids: int,
):
    """Expand candidate (u, v, w) triples into deduplicated matching-id
    pair edges, vectorized (the GraphMatchingNodeMap product expansion,
    /root/reference/src/implementation/matchtigs/mod.rs:273-305).

    Returns (keys_a, keys_b, w, u, v) arrays, one row per unique id pair.
    """
    if len(candidates) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, e, e
    u = candidates[:, 0]
    v = candidates[:, 1]
    w = candidates[:, 2]
    assert np.all(w >= 1), "zero-weight candidate path"
    cu = ids_count[u]
    cv = ids_count[v]
    max_c = int(max(cu.max(initial=1), cv.max(initial=1)))
    parts = []
    for i in range(max_c):
        for j in range(max_c):
            mask = (i < cu) & (j < cv)
            if not mask.any():
                continue
            a = ids_start[u[mask]] + i
            b = ids_start[v[mask]] + j
            keep = a != b  # same-id self-loops only from mirror biedges
            parts.append(
                np.stack(
                    [
                        np.minimum(a, b)[keep],
                        np.maximum(a, b)[keep],
                        w[mask][keep],
                        u[mask][keep],
                        v[mask][keep],
                    ],
                    axis=1,
                )
            )
    allp = np.concatenate(parts)
    key = allp[:, 0] * n_ids + allp[:, 1]
    # The same id pair can arise with different weights (unbalanced
    # self-mirror endpoints where d(u->v) != d(v->u)); keep the minimum
    # weight per pair so the matching never uses the longer path.
    order = np.lexsort((allp[:, 2], key))
    allp = allp[order]
    key = key[order]
    _, first = np.unique(key, return_index=True)
    rows = allp[first]
    return rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3], rows[:, 4]


def compute_matchtigs(g: Bigraph, config: MatchtigConfig) -> list[np.ndarray]:
    """Mutates `g` (adds dummy biedges) and returns edge walks."""
    k = config.k
    out_nodes, in_mask, _ = unbalanced_nodes(g)
    diff = g.imbalances()
    logger.info(
        "Found %d nodes with missing outgoing and %d with missing incoming edges",
        len(out_nodes),
        int(in_mask.sum()),
    )

    # All-pairs bounded shortest paths (targets = every in-node).
    gt_config = GreedytigConfig(
        k=k,
        initial_capacity=config.initial_capacity,
        max_capacity=config.max_capacity,
        batch_size=config.batch_size,
        host_threads=config.host_threads,
        performance_counters=config.performance_counters,
    )
    stats = SearchStats()
    candidates = collect_candidates(g, out_nodes, in_mask, k, gt_config, stats)
    logger.info("Found %d candidate shortest paths", len(candidates))
    if config.performance_counters and len(candidates):
        stats.log_ball_sizes(candidates, g.n_nodes, out_nodes)

    # Expand binodes into matching ids and collapse candidates to id pairs.
    ids_start, ids_count, n_ids, reps, offsets = _matching_node_ids(g, diff)
    logger.info("Matching instance has %d expanded nodes", n_ids)

    ka, kb, kw, ku, kv = _collapse_candidates(
        g, candidates, ids_start, ids_count, n_ids
    )
    logger.info("Collapsed to %d matching edges", len(ka))

    # Components of the bidirected graph (doubled edges + mirror pairing);
    # each component's Eulerian tour needs >= 1 break, granted free by the
    # per-component gadget (the reference's 4-extra-nodes-per-WCC).
    comp = _bidirected_components(g)
    rep_counts = (offsets[1:] - offsets[:-1]).astype(np.int64)
    id_comp = np.repeat(comp[reps].astype(np.int64), rep_counts)

    matched_pairs = _allocate_and_match(
        ka, kb, kw, n_ids, id_comp, k, dense_limit=config.dense_limit
    )
    logger.info("Matched %d id pairs", len(matched_pairs))

    if config.matching_file_prefix is not None:
        inst = f"{config.matching_file_prefix}.matching"
        with open(inst, "w") as f:
            f.write(f"{n_ids} {len(ka)}\n")
            for a, b, w in np.stack([ka, kb, kw], axis=1).tolist():
                f.write(f"{a} {b} {w}\n")
        with open(inst + ".solution", "w") as f:
            f.write(f"{n_ids} {len(matched_pairs)}\n")
            for a, b in matched_pairs:
                f.write(f"{a} {b}\n")
        logger.info("Wrote matching instance and solution to %s[.solution]", inst)

    # Apply matching: insert cheap dummy biedges (lookup matched id pairs
    # back to their (u, v, w) via the sorted pair keys).
    pair_keys = ka * n_ids + kb
    key_order = np.argsort(pair_keys)
    sorted_keys = pair_keys[key_order]
    dummy_edge_id = 0
    for a, b in matched_pairs:
        key = min(a, b) * n_ids + max(a, b)
        idx = int(key_order[np.searchsorted(sorted_keys, key)])
        assert pair_keys[idx] == key, "matched pair has no edge"
        dummy_edge_id += 1
        g.add_biedge_pair(
            int(ku[idx]),
            int(kv[idx]),
            weight=int(kw[idx]),
            handle=-1,
            forward=True,
            dummy_id=dummy_edge_id,
        )

    assert g.verify_node_pairing()
    assert g.verify_edge_mirror_property()

    logger.info("Making graph Eulerian by completing unmatched nodes")
    euler.make_eulerian_with_breaking_edges(g, k, dummy_edge_id)
    if not euler.decomposes_into_eulerian_bicycles(g):
        raise AssertionError("Failed to make the graph Eulerian")
    euler.assert_no_consecutive_dummy_edges(g, k)

    cycles = euler.eulerian_bicycle_decomposition(g)
    logger.info("Found %d Eulerian bicycles", len(cycles))
    tigs = euler.break_cycles(g, cycles, k)
    logger.info("Found %d matchtigs", len(tigs))
    return tigs


def _allocate_and_match(
    ka: np.ndarray,
    kb: np.ndarray,
    kw: np.ndarray,
    n_ids: int,
    id_comp: np.ndarray,  # input-graph component per matching id
    k: int,
    dense_limit: int | None = None,
) -> list[tuple[int, int]]:
    """Exact optimal matching, decomposed by *candidate-graph* components.

    The matching constraints only bind within connected components of the
    candidate (id-pair) graph, which stay small even when the input graph
    is one giant component.  The only coupling is the reference's
    4-extra-nodes-per-WCC construction: each input component donates
    exactly two zero-cost unmatched slots (its mandatory cycle's two tig
    ends).  Those slots go to zero-cost absorbers first (ids with no
    candidate edges, or odd-size components, where one member is unmatched
    anyway); only when an input component lacks two such absorbers are the
    forced-deletion variants solved and allocated exactly (a 2-unit
    knapsack over per-component deltas, which are always <= 0).
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    from ..ops.perfect_matching import component_matching_variants

    if n_ids == 0:
        return []
    if len(ka):
        adj = coo_matrix(
            (np.ones(len(ka), np.int8), (ka, kb)), shape=(n_ids, n_ids)
        )
        _, cc = connected_components(adj, directed=False)
    else:
        cc = np.arange(n_ids)
    has_edge = np.zeros(n_ids, dtype=bool)
    has_edge[ka] = True
    has_edge[kb] = True

    # bucket edges by candidate component
    edge_cc = cc[ka]
    order = np.argsort(edge_cc, kind="stable")
    edges_sorted = np.stack([ka, kb, kw], axis=1)[order] if len(ka) else None
    cc_sorted = edge_cc[order] if len(ka) else np.empty(0, dtype=np.int64)
    cc_labels, cc_starts = (
        np.unique(cc_sorted, return_index=True)
        if len(ka)
        else (np.empty(0, np.int64), np.empty(0, np.int64))
    )
    cc_to_slot = {int(c): i for i, c in enumerate(cc_labels)}
    cc_ends = np.append(cc_starts[1:], len(cc_sorted))

    # members per candidate component
    ids = np.arange(n_ids)
    member_order = np.argsort(cc[has_edge], kind="stable")
    members_sorted = ids[has_edge][member_order]
    mcc_sorted = cc[has_edge][member_order]
    m_labels, m_starts = np.unique(mcc_sorted, return_index=True)
    m_ends = np.append(m_starts[1:], len(mcc_sorted))
    m_slot = {int(c): i for i, c in enumerate(m_labels)}

    def comp_members(c: int) -> np.ndarray:
        i = m_slot[int(c)]
        return members_sorted[m_starts[i] : m_ends[i]]

    def comp_edges(c: int) -> np.ndarray:
        i = cc_to_slot[int(c)]
        return edges_sorted[cc_starts[i] : cc_ends[i]]

    matched_pairs: list[tuple[int, int]] = []
    # Bucket matching ids by input component once (sorted slices) instead
    # of a full boolean scan per component.
    wcc_order = np.argsort(id_comp, kind="stable")
    w_labels, w_starts = np.unique(id_comp[wcc_order], return_index=True)
    w_ends = np.append(w_starts[1:], n_ids)
    # Periodic progress (the reference prints % / dots during its long
    # phases, greedytigs/mod.rs:514-522, matchtigs/mod.rs:224-232).
    import time as _time

    import threading as _threading

    t_start = _time.monotonic()
    last_log = [t_start]
    ids_done = [0]
    progress_lock = _threading.Lock()

    def note_progress(n_done_ids: int) -> None:
        with progress_lock:
            ids_done[0] += n_done_ids
            now = _time.monotonic()
            if now - last_log[0] < 5.0:
                return
            last_log[0] = now
            done, total = ids_done[0], n_ids
        logger.info(
            "Matching: %d / %d ids solved (%.0f%%, %.0fs)",
            done,
            total,
            100.0 * done / max(1, total),
            _time.monotonic() - t_start,
        )

    def solve_uncached(c, deletions):
        t0 = _time.monotonic()
        res = component_matching_variants(
            comp_members(c), comp_edges(c), k, deletions, dense_limit
        )
        el = _time.monotonic() - t0
        if el >= 1.0:
            logger.info(
                "Solved matching component: %d ids, %d edges, "
                "deletion variants %s, %.1fs",
                len(comp_members(c)),
                len(comp_edges(c)),
                list(deletions),
                el,
            )
        note_progress(len(comp_members(c)))
        return res

    # Pre-solve every component in a thread pool, largest first (the
    # native blossom releases the GIL, so giant-tangle solves overlap;
    # the reference likewise fans its Dijkstra phase over threads,
    # matchtigs/mod.rs:396-459).  The deletion variants a component needs
    # depend only on its WCC's zero-absorber count, known without solving.
    wcc_need: dict[int, int] = {}
    comp_deletions: dict[int, tuple[int, ...]] = {}
    for wi in range(len(w_labels)):
        ids_w = wcc_order[w_starts[wi] : w_ends[wi]]
        singles = int((~has_edge[ids_w]).sum())
        comp_ids = np.unique(cc[ids_w[has_edge[ids_w]]])
        zero_absorbers = singles + sum(
            1 for c in comp_ids if len(comp_members(c)) % 2 == 1
        )
        need = max(0, 2 - zero_absorbers)
        wcc_need[wi] = need
        dels = (0,) if need == 0 else ((0, 1) if need == 1 else (0, 1, 2))
        for c in comp_ids:
            comp_deletions[int(c)] = dels

    solved: dict[int, dict] = {}
    if comp_deletions:
        import os
        from concurrent.futures import ThreadPoolExecutor

        by_size = sorted(
            comp_deletions, key=lambda c: len(comp_members(c)), reverse=True
        )
        n_workers = min(os.cpu_count() or 1, max(1, len(by_size)))
        with ThreadPoolExecutor(max_workers=n_workers) as ex:
            futs = {
                c: ex.submit(solve_uncached, c, comp_deletions[c])
                for c in by_size
            }
            for c, fut in futs.items():
                solved[c] = fut.result()

    def solve(c, deletions):
        return solved[int(c)]

    for wi in range(len(w_labels)):
        ids_w = wcc_order[w_starts[wi] : w_ends[wi]]
        singles = int((~has_edge[ids_w]).sum())
        comp_ids = np.unique(cc[ids_w[has_edge[ids_w]]])
        sizes = {int(c): len(comp_members(c)) for c in comp_ids}
        zero_absorbers = singles + sum(1 for c in comp_ids if sizes[int(c)] % 2 == 1)
        need = max(0, 2 - zero_absorbers)
        note_progress(singles)

        if need == 0 or not len(comp_ids):
            for c in comp_ids:
                matched_pairs.extend(solve(c, (0,))[0][1])
            continue

        # forced deletions must land on even components: solve variants
        deletions = (0, 1) if need == 1 else (0, 1, 2)
        variants = {int(c): solve(c, deletions) for c in comp_ids}
        deltas = {
            c: v[1][0] - v[0][0] for c, v in variants.items() if 1 in v
        }
        chosen: dict[int, int] = {c: 0 for c in variants}
        if need == 1:
            best = max(deltas, key=deltas.get, default=None)
            if best is not None:
                chosen[best] = 1
        else:
            # best single comp taking both vs best two comps taking one each
            single = {
                c: v[2][0] - v[0][0] for c, v in variants.items() if 2 in v
            }
            best_single = max(single, key=single.get, default=None)
            top2 = sorted(deltas, key=deltas.get, reverse=True)[:2]
            two_val = (
                sum(deltas[c] for c in top2) if len(top2) == 2 else None
            )
            if best_single is not None and (
                two_val is None or single[best_single] >= two_val
            ):
                chosen[best_single] = 2
            elif two_val is not None:
                for c in top2:
                    chosen[c] = 1
        for c, j in chosen.items():
            matched_pairs.extend(variants[c][j][1])
    return matched_pairs


def _bidirected_components(g: Bigraph) -> np.ndarray:
    """Connected components over edges + mirror-node pairing (undirected)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = g.n_nodes
    rows = np.concatenate([g.srcs(), np.arange(n, dtype=np.int32)])
    cols = np.concatenate([g.dsts(), g.mirror_node])
    data = np.ones(len(rows), dtype=np.int8)
    adj = coo_matrix((data, (rows, cols)), shape=(n, n))
    _, labels = connected_components(adj, directed=False)
    return labels
