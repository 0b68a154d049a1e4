"""Per-WCC distributed euler+break == the single-host pipeline, exactly.

The distributed path (ops/euler.py:decompose_break_wcc_part) deals the
balanced graph's mirror-connected components over N parts, runs the
native parsplice per part with GLOBAL arc ids driving the splitter start
set, breaks cycles per part, and merges tig slices by (class,
first-arc) keys.  The contract under test: for every N and any part
order, the merged tig stream is byte-identical to the plain
decomposition+break — the property the multi-host mesh pipeline relies
on (reference analog: the per-WCC work split at
/root/reference/src/implementation/matchtigs/mod.rs:555-576).
"""

import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.ops import euler

from test_native_parity import CASES, _random_multi_component


def _balanced_graph(case):
    store, _, k = testing.make_unitig_store(**case)
    g = build_bigraph_from_unitigs(store, k)
    euler.make_eulerian_with_breaking_edges(g, k, 0)
    return g, k


def _plain_tigs(g, k):
    cycles = euler.eulerian_bicycle_decomposition(g, method="parsplice")
    return euler.break_cycles(g, cycles, k)


def _assert_walks_equal(a, b):
    assert np.array_equal(np.asarray(a.offsets), np.asarray(b.offsets))
    assert np.array_equal(np.asarray(a.flat), np.asarray(b.flat))


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("n_parts", [1, 2, 3])
def test_wcc_parts_match_plain(case, n_parts):
    g, k = _balanced_graph(case)
    expect = _plain_tigs(g, k)
    parts = [
        euler.decompose_break_wcc_part(g, k, n_parts, p)
        for p in range(n_parts)
    ]
    merged = euler.merge_tig_parts(parts)
    _assert_walks_equal(merged, expect)
    # part order must not matter (multi-host gather order independence)
    merged_rev = euler.merge_tig_parts(parts[::-1])
    _assert_walks_equal(merged_rev, expect)


@pytest.mark.parametrize("seed", range(20))
def test_wcc_parts_fuzz_multi_component(seed):
    """Random multi-component balanced graphs (incl. splitterless tiny
    cycles and self-mirrors): 2- and 3-part distribution reproduces the
    plain tig stream."""
    g = _random_multi_component(seed)
    k = 5
    expect = _plain_tigs(g, k)
    for n_parts in (2, 3):
        parts = [
            euler.decompose_break_wcc_part(g, k, n_parts, p)
            for p in range(n_parts)
        ]
        merged = euler.merge_tig_parts(parts)
        _assert_walks_equal(merged, expect)


def test_wcc_labels_cover_bicycles():
    """Each decomposition cycle's arcs live in exactly one binode
    component; distinct cycles get distinct components."""
    g, k = _balanced_graph(CASES[0])
    labels, n_comps = euler.binode_wcc_labels(g)
    src = g.srcs()
    cycles = euler.eulerian_bicycle_decomposition(g, method="parsplice")
    seen = set()
    for c in cycles:
        c = np.asarray(c)
        comp = set(labels[src[c]].tolist())
        assert len(comp) == 1
        comp_id = comp.pop()
        assert comp_id not in seen
        seen.add(comp_id)
