"""Link-based topology building (GFA L-lines / BCALM2 annotations) must
agree with the (k-1)-overlap hashing builder on true DBG unitig sets."""

import gzip

import numpy as np
import pytest

from matchtigs_tpu import testing
from matchtigs_tpu.graph.build import (
    build_bigraph_from_links,
    build_bigraph_from_unitigs,
)
from matchtigs_tpu.io.readers import read_bcalm2, read_gfa


def _links_from_overlap_graph(g):
    """Derive the link list the formats would declare."""
    links = []
    for v in range(g.n_nodes):
        for ei in g.in_edges_of(v):
            for eo in g.out_edges_of(v):
                links.append(
                    (
                        int(g.handles()[ei]),
                        bool(g.forwards()[ei]),
                        int(g.handles()[eo]),
                        bool(g.forwards()[eo]),
                    )
                )
    return links


@pytest.mark.parametrize(
    "case",
    [
        dict(genome_length=3000, k=9, seed=0),
        dict(genome_length=6000, k=11, seed=1),
    ],
)
def test_links_builder_matches_overlap_builder(case):
    store, _, k = testing.make_unitig_store(**case)
    g_overlap = build_bigraph_from_unitigs(store, k)
    links = _links_from_overlap_graph(g_overlap)
    g_links = build_bigraph_from_links(store, links, k)
    assert g_links.n_edges == g_overlap.n_edges
    assert sorted(g_links.imbalances().tolist()) == sorted(
        g_overlap.imbalances().tolist()
    )
    # same degree multisets
    assert sorted(g_links.out_degrees().tolist()) == sorted(
        g_overlap.out_degrees().tolist()
    )


def test_gfa_links_roundtrip(tmp_path):
    store, _, k = testing.make_unitig_store(genome_length=3000, k=9, seed=2)
    g = build_bigraph_from_unitigs(store, k)
    links = _links_from_overlap_graph(g)
    path = tmp_path / "in.gfa.gz"
    with gzip.open(path, "wb") as f:
        f.write(b"H\tVN:Z:1.0\tKL:Z:%d\n" % k)
        for i in range(len(store)):
            f.write(b"S\t%d\t%s\n" % (i, store.get_ascii(i)))
        for a, sa, b, sb in links:
            f.write(
                b"L\t%d\t%s\t%d\t%s\t%dM\n"
                % (a, b"+" if sa else b"-", b, b"+" if sb else b"-", k - 1)
            )
    store2, props = read_gfa(path)
    assert props.k == k
    assert len(props.links) == len(links)
    g2 = build_bigraph_from_links(store2, props.links, k)
    assert sorted(g2.imbalances().tolist()) == sorted(g.imbalances().tolist())


def test_bcalm2_links_roundtrip(tmp_path):
    store, _, k = testing.make_unitig_store(genome_length=3000, k=9, seed=3)
    g = build_bigraph_from_unitigs(store, k)
    links = _links_from_overlap_graph(g)
    per_uni: dict[int, list] = {i: [] for i in range(len(store))}
    for a, sa, b, sb in links:
        per_uni[a].append((sa, b, sb))
    path = tmp_path / "in.bcalm.fa"
    with open(path, "wb") as f:
        for i in range(len(store)):
            tags = b" ".join(
                b"L:%s:%d:%s" % (b"+" if sa else b"-", b, b"+" if sb else b"-")
                for sa, b, sb in per_uni[i]
            )
            f.write(b">%d LN:i:%d %s\n%s\n" % (i, store.length(i), tags, store.get_ascii(i)))
    store2, links2 = read_bcalm2(path)
    g2 = build_bigraph_from_links(store2, links2, k)
    assert sorted(g2.imbalances().tolist()) == sorted(g.imbalances().tolist())


def test_gfa_links_before_segments(tmp_path):
    """L-lines may precede S-lines; name resolution is deferred."""
    store, _, k = testing.make_unitig_store(genome_length=3000, k=9, seed=4)
    g = build_bigraph_from_unitigs(store, k)
    links = _links_from_overlap_graph(g)
    path = tmp_path / "links_first.gfa"
    with open(path, "wb") as f:
        f.write(b"H\tKL:Z:%d\n" % k)
        for a, sa, b, sb in links:
            f.write(
                b"L\t%d\t%s\t%d\t%s\t%dM\n"
                % (a, b"+" if sa else b"-", b, b"+" if sb else b"-", k - 1)
            )
        for i in range(len(store)):
            f.write(b"S\t%d\t%s\n" % (i, store.get_ascii(i)))
    store2, props = read_gfa(path)
    assert len(props.links) == len(links)
    g2 = build_bigraph_from_links(store2, props.links, k)
    assert sorted(g2.imbalances().tolist()) == sorted(g.imbalances().tolist())
