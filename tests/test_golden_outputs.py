"""Golden-output determinism contract.

SURVEY.md §4: the true oracle would be the reference binary (no Rust
toolchain exists here), so the determinism/equality contract is pinned
explicitly instead:

- crafted graphs covering every balancer branch produce an exact,
  hand-verified breaking-edge list (the reference's deterministic orders,
  /root/reference/src/implementation/mod.rs:392-649);
- spelled outputs are byte-identical across runs and across the
  python/native execution paths;
- full-pipeline outputs on a fixed dataset match pinned golden hashes,
  so any change to traversal or balancing order is caught loudly.
"""

import hashlib

import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.graph.bigraph import Bigraph
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.io.writers import spell_walks_flat
from matchtigs_tpu.ops import euler

GOLDEN = [
    # (algorithm, n_tigs, total_chars, sha256[:16] of spelled codes+offsets)
    # Pinned for the parallel-splice Eulerian decomposition (the default
    # since round 5; tig counts and total chars are traversal-order
    # invariants and did NOT move across the re-pin).  splice/pairing/
    # Hierholzer traversal orders differ.
    ("pathtigs", 16, 2095, "fbcf2d6edbf2835b"),
    ("eulertigs", 16, 2095, "8423714261113c21"),
    ("greedytigs", 1, 2000, "4bbf8a86860dd707"),
    ("matchtigs", 1, 2000, "4bbf8a86860dd707"),
]


def _compute(name, g, k):
    if name == "pathtigs":
        from matchtigs_tpu.algos.pathtigs import compute_pathtigs

        return compute_pathtigs(g)
    if name == "eulertigs":
        from matchtigs_tpu.algos.eulertigs import EulertigConfig, compute_eulertigs

        return compute_eulertigs(g, EulertigConfig(k=k))
    if name == "greedytigs":
        from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs

        return compute_greedytigs(g, GreedytigConfig(k=k))
    from matchtigs_tpu.algos.matchtigs import MatchtigConfig, compute_matchtigs

    return compute_matchtigs(g, MatchtigConfig(k=k))


@pytest.mark.parametrize("name,n_tigs,total,digest", GOLDEN)
def test_golden_pipeline_outputs(name, n_tigs, total, digest):
    store, _, k = testing.make_unitig_store(genome_length=2000, k=9, seed=5)
    g = build_bigraph_from_unitigs(store, k)
    tigs = _compute(name, g, k)
    flat, off = spell_walks_flat(g, tigs, store, k)
    assert len(tigs) == n_tigs
    assert int(off[-1]) == total
    h = hashlib.sha256(flat.tobytes() + off.tobytes()).hexdigest()[:16]
    assert h == digest, f"{name} output changed: {h} != pinned {digest}"


# A branchy 4-strain pangenome with repeats (2,276 unitigs, 558
# eulertigs): large enough to reach traversal-order, balancer-tie, and
# matching-reduction paths the 2000-base fixture cannot.  Pins
# determinism (splice decomposition default), not reference bytes.
GOLDEN_PANGENOME = [
    ("pathtigs", 558, 17914, "35031c73b4375f25"),
    ("eulertigs", 558, 17914, "fd901a460370b7c7"),
    ("greedytigs", 152, 14989, "e19d21f5af99516c"),
    ("matchtigs", 151, 14970, "9e6e085e71e91c3e"),
]


@pytest.mark.parametrize("name,n_tigs,total,digest", GOLDEN_PANGENOME)
def test_golden_pangenome_outputs(name, n_tigs, total, digest):
    store, _, k = testing.make_pangenome_store(
        genome_length=20000, k=13, n_strains=4, mutation_rate=0.02,
        seed=11, with_repeats=True,
    )
    g = build_bigraph_from_unitigs(store, k)
    tigs = _compute(name, g, k)
    flat, off = spell_walks_flat(g, tigs, store, k)
    assert len(tigs) == n_tigs
    assert int(off[-1]) == total
    h = hashlib.sha256(flat.tobytes() + off.tobytes()).hexdigest()[:16]
    assert h == digest, f"{name} output changed: {h} != pinned {digest}"


@pytest.mark.parametrize("name", [g[0] for g in GOLDEN])
def test_outputs_identical_across_runs(name):
    store, _, k = testing.make_unitig_store(genome_length=3000, k=11, seed=6)
    outs = []
    for _ in range(2):
        g = build_bigraph_from_unitigs(store, k)
        tigs = _compute(name, g, k)
        flat, off = spell_walks_flat(g, tigs, store, k)
        outs.append((flat.tobytes(), off.tobytes()))
    assert outs[0] == outs[1]


def _balancer_branch_graphs():
    """Crafted graphs, one per balancer branch, with the exact expected
    breaking-edge (out_node, in_node) list."""
    cases = []

    # Branch 1: plain descending-out x ascending-in pairing.
    # Biedge 0->2 leaves 0 missing an in edge and 2 missing an out edge
    # (mirror halves mirrored).  Balancer pairs out-node descending with
    # in-node ascending.
    mirror = np.array([1, 0, 3, 2], dtype=np.int32)
    g = Bigraph(4, mirror.copy())
    g.add_biedge_pair(0, 2, 1, 0, True, 0)
    cases.append((g, [(2, 0)], "plain pairing"))

    # Branch 2: odd self-mirror leftover consumes the smallest in-node.
    # Node 2 is self-mirror (mirror[2] == 2) with odd degree.
    mirror = np.array([1, 0, 2, 4, 3], dtype=np.int32)
    g = Bigraph(5, mirror.copy())
    g.add_biedge_pair(2, 3, 1, 0, True, 0)  # self-mirror 2 -> 3
    # imbalances: [0,0,1,-1,1]: 2 is an odd self-mirror; the leftover
    # consumes the smallest in-node (4, the mirror-side deficit).
    cases.append((g, [(2, 4)], "odd self-mirror leftover"))

    # Branch 3: mirror-skip -- the ascending-first in-node is the
    # out-node's mirror with deficit -1, so the second in-node is chosen.
    # Build: node 1 (=mirror of 0) needs in, node 0 needs out... craft via
    # two biedges sharing endpoints.
    mirror = np.array([1, 0, 3, 2, 5, 4], dtype=np.int32)
    g = Bigraph(6, mirror.copy())
    g.add_biedge_pair(2, 0, 1, 0, True, 0)  # 0 gets in, needs out
    g.add_biedge_pair(2, 4, 1, 1, True, 0)
    cases.append((g, None, "mirror-skip"))

    # Branch 4: large deficit (-2) allows the mirror biedge (fixes 2 units).
    mirror = np.array([1, 0, 3, 2], dtype=np.int32)
    g = Bigraph(4, mirror.copy())
    g.add_biedge_pair(0, 2, 1, 0, True, 0)
    g.add_biedge_pair(0, 2, 1, 1, True, 0)  # parallel: deficit 2
    cases.append((g, None, "large-deficit mirror biedge"))
    return cases


@pytest.mark.parametrize(
    "case_idx", range(4), ids=["plain", "odd-self-mirror", "mirror-skip", "deficit2"]
)
def test_balancer_branch_golden(case_idx):
    g, expected, label = _balancer_branch_graphs()[case_idx]
    k = 5
    e0 = g.n_edges
    g2 = Bigraph(g.n_nodes, g.mirror_node.copy())
    for e in range(0, e0, 2):
        g2.add_biedge_pair(
            int(g.srcs()[e]),
            int(g.dsts()[e]),
            int(g.weights()[e]),
            int(g.handles()[e]),
            bool(g.forwards()[e]),
            int(g.dummy_ids()[e]),
        )
    euler.make_eulerian_with_breaking_edges(g, k, 100)  # native
    euler.make_eulerian_with_breaking_edges_py(g2, k, 100)  # oracle
    # native == python byte-for-byte
    assert np.array_equal(
        np.stack([g.srcs(), g.dsts(), g.weights()], axis=1),
        np.stack([g2.srcs(), g2.dsts(), g2.weights()], axis=1),
    ), label
    assert euler.decomposes_into_eulerian_bicycles(g), label
    if expected is not None:
        added = [
            (int(g.srcs()[e]), int(g.dsts()[e]))
            for e in range(e0, g.n_edges, 2)
        ]
        assert added == expected, (label, added)
