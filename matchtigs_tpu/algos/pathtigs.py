"""Pathtigs: heuristically small edge-disjoint biwalk cover.

Capability-equivalent of ``PathtigAlgorithm`` /
``bigraph::algo::walk_cover::arbitrary_biwalk_cover``
(/root/reference/src/implementation/pathtigs/mod.rs:9-41).  The graph is
not modified.  Each biedge is covered exactly once: traversing an edge
consumes its mirror (e ^ 1).  Walks are maximal: each is extended forward
from its end and backward from its start until no unconsumed edge remains,
which yields the same heuristically-small cover class as the reference
(simplitigs/UST-style).
"""

from __future__ import annotations

import logging

import numpy as np

from ..graph.bigraph import Bigraph

logger = logging.getLogger(__name__)


def compute_pathtigs(g: Bigraph) -> list[np.ndarray]:
    E = g.n_edges
    if E == 0:
        return []
    out_off, out_edges, in_off, in_edges = g.csr()
    src = g.srcs()
    dst = g.dsts()

    used = np.zeros(E, dtype=bool)
    out_cursor = out_off[:-1].copy()
    in_cursor = in_off[:-1].copy()

    def next_unused_out(v: int) -> int:
        c = out_cursor[v]
        end = out_off[v + 1]
        while c < end and used[out_edges[c]]:
            c += 1
        out_cursor[v] = c
        return int(out_edges[c]) if c < end else -1

    def next_unused_in(v: int) -> int:
        c = in_cursor[v]
        end = in_off[v + 1]
        while c < end and used[in_edges[c]]:
            c += 1
        in_cursor[v] = c
        return int(in_edges[c]) if c < end else -1

    walks: list[np.ndarray] = []
    for e0 in range(E):
        if used[e0]:
            continue
        used[e0] = True
        used[e0 ^ 1] = True
        fwd = [e0]
        cur = int(dst[e0])
        while True:
            e = next_unused_out(cur)
            if e < 0:
                break
            used[e] = True
            used[e ^ 1] = True
            fwd.append(e)
            cur = int(dst[e])
        bwd: list[int] = []
        cur = int(src[e0])
        while True:
            e = next_unused_in(cur)
            if e < 0:
                break
            used[e] = True
            used[e ^ 1] = True
            bwd.append(e)
            cur = int(src[e])
        walks.append(np.asarray(bwd[::-1] + fwd, dtype=np.int64))

    logger.info("Found %d pathtigs", len(walks))
    return walks
