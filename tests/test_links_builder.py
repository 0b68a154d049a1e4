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


def test_gfa_string_names_fallback(tmp_path):
    """Non-numeric segment names route through the python name map."""
    store, _, k = testing.make_unitig_store(genome_length=3000, k=9, seed=5)
    g = build_bigraph_from_unitigs(store, k)
    links = _links_from_overlap_graph(g)
    path = tmp_path / "named.gfa"
    with open(path, "wb") as f:
        f.write(b"H\tKL:Z:%d\n" % k)
        for i in range(len(store)):
            f.write(b"S\tutg%d\t%s\n" % (i, store.get_ascii(i)))
        for a, sa, b, sb in links:
            f.write(
                b"L\tutg%d\t%s\tutg%d\t%s\t%dM\n"
                % (a, b"+" if sa else b"-", b, b"+" if sb else b"-", k - 1)
            )
    store2, props = read_gfa(path)
    assert len(props.links) == len(links)
    g2 = build_bigraph_from_links(store2, props.links, k)
    assert sorted(g2.imbalances().tolist()) == sorted(g.imbalances().tolist())


def test_gfa_leading_zero_names_fallback(tmp_path):
    """'01' and '1' are distinct names; the numeric fast path must bail."""
    path = tmp_path / "zeros.gfa"
    with open(path, "wb") as f:
        f.write(b"H\tKL:Z:5\n")
        f.write(b"S\t01\tACGTACGT\n")
        f.write(b"S\t1\tCGTACGTA\n")
        f.write(b"L\t01\t+\t1\t+\t4M\n")
    store, props = read_gfa(path)
    assert len(store) == 2
    assert len(props.links) == 1
    a, sa, b, sb = next(iter(props.links))
    assert (a, b) == (0, 1)


def test_gfa_unresolved_link_names_dropped(tmp_path):
    """Links naming unknown segments are dropped (both name styles)."""
    for names in ((b"7", b"99"), (b"x", b"y")):
        path = tmp_path / ("drop_%s.gfa" % names[0].decode())
        with open(path, "wb") as f:
            f.write(b"H\tKL:Z:5\n")
            f.write(b"S\t%s\tACGTACGT\n" % names[0])
            f.write(b"L\t%s\t+\t%s\t-\t4M\n" % (names[0], names[1]))
            f.write(b"L\t%s\t+\t%s\t-\t4M\n" % (names[0], names[0]))
        store, props = read_gfa(path)
        assert len(props.links) == 1, names
        a, sa, b, sb = next(iter(props.links))
        assert (a, sa, b, sb) == (0, True, 0, False), names


def test_bcalm2_malformed_tags_skipped(tmp_path):
    """Stencil candidates without a full L:s:id:s shape are ignored."""
    path = tmp_path / "mal.bcalm.fa"
    with open(path, "wb") as f:
        f.write(b">0 LN:i:8 L:+:1:- L:+:x:- XL:+:1:+ L:-:1 KL:+:2:+\n")
        f.write(b"ACGTACGT\n")
        f.write(b">1 L:-:0:+\nCGTACGTA\n")
    store, links = read_bcalm2(path)
    got = sorted(iter(links))
    assert got == [(0, True, 1, False), (1, False, 0, True)]


def test_empty_inputs(tmp_path):
    from matchtigs_tpu.io.readers import read_fasta

    for name, reader in (
        ("e.fa", read_fasta),
        ("e.gfa", read_gfa),
        ("e.bcalm.fa", read_bcalm2),
    ):
        p = tmp_path / name
        p.write_bytes(b"")
        store, _ = reader(p)
        assert len(store) == 0, name


def test_links_column_container_roundtrip():
    from matchtigs_tpu.io.readers import Links

    rows = [(0, True, 1, False), (1, False, 0, True)]
    ln = Links.from_rows(rows)
    assert len(ln) == 2
    assert list(iter(ln)) == rows
    assert Links.from_rows(ln) is ln
    assert len(Links.from_rows([])) == 0 and not Links.from_rows([])
