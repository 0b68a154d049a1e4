"""Unitig input parsers: plain fasta, BCALM2/GGCAT fasta, GFA (all + gzip).

Capability-equivalent of ``genome-graph::io`` (call sites
/root/reference/src/bin.rs:31-43,874-915).  All three formats produce a
:class:`SequenceStore` plus a topology source: GFA L-lines and BCALM2
header annotations yield explicit links (built with the union-find
link builder, the reference's fast path); plain fasta falls back to
vectorized (k-1)-overlap deduplication
(:func:`matchtigs_tpu.graph.build.build_bigraph_from_unitigs`).  For true
compacted de Bruijn unitig sets the two constructions agree.

Gzip is sniffed by the ``.gz`` extension, like the reference
(/root/reference/src/bin.rs:877,894,905).
"""

from __future__ import annotations

import gzip
import io
import re
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..utils import dna
from .sequence_store import SequenceStore


@dataclass
class GfaProperties:
    k: int | None
    header: str | None
    # L-line topology: (unitig_a, strand_a, unitig_b, strand_b) per link,
    # unitig ids being S-line ordinals.
    links: list[tuple[int, bool, int, bool]] | None = None


def _open_maybe_gz(path: str | Path, mode: str = "rb"):
    path = Path(path)
    if path.suffix == ".gz":
        return gzip.open(path, mode)
    return open(path, mode)


def _iter_fasta_records(stream) -> "iter[tuple[bytes, bytes]]":
    """Yield (header, sequence) byte pairs from a fasta stream."""
    header = None
    chunks: list[bytes] = []
    for line in stream:
        line = line.rstrip(b"\r\n")
        if not line:
            continue
        if line.startswith(b">"):
            if header is not None:
                yield header, b"".join(chunks)
            header = line[1:]
            chunks = []
        else:
            chunks.append(line)
    if header is not None:
        yield header, b"".join(chunks)


def read_fasta(
    path: str | Path, with_headers: bool = True
) -> tuple[SequenceStore, list[bytes] | None]:
    """Read unitigs from a (possibly gzipped) fasta file.

    Covers both the plain-fasta path (/root/reference/src/bin.rs:891-901)
    and the BCALM2 path (:902-915): BCALM2 headers carry topology
    annotations (``L:+:12:-`` links), but the graph builder re-derives
    topology from the sequences, so both reduce to sequence loading.

    The parse is vectorized over the whole byte buffer: per-record python
    loops cost ~8us per unitig (60s+ on a 7.8M-unitig human-scale file)
    against ~2s for the numpy line scan + one bulk encode.
    """
    with _open_maybe_gz(path) as f:
        data = f.read()
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    if n == 0:
        return SequenceStore.from_flat(
            np.empty(0, np.uint8), np.zeros(1, np.int64)
        ), []
    nl = np.flatnonzero(arr == 10)  # '\n'
    line_s = np.empty(len(nl) + 1, dtype=np.int64)
    line_s[0] = 0
    line_s[1:] = nl + 1
    line_e = np.append(nl, np.int64(n))
    line_e -= (line_e > line_s) & (arr[np.maximum(line_e - 1, 0)] == 13)  # \r
    keep = line_s < line_e
    line_s, line_e = line_s[keep], line_e[keep]
    is_hdr = arr[line_s] == ord(">")
    rec = np.cumsum(is_hdr) - 1
    if len(rec) and rec[0] < 0:
        raise ValueError(f"{path}: sequence data before the first '>' header")
    n_rec = int(rec[-1]) + 1 if len(rec) else 0
    seq = ~is_hdr
    lens = (line_e - line_s)[seq]
    rec_len = np.bincount(rec[seq], weights=lens, minlength=n_rec).astype(
        np.int64
    )
    offsets = np.zeros(n_rec + 1, dtype=np.int64)
    np.cumsum(rec_len, out=offsets[1:])
    # Boolean-mask out the non-sequence bytes (newlines, \r, header
    # lines): headers are the small fraction, so this avoids a
    # full-length int64 gather index (3.7 GB of temporaries at a 60M-base
    # file).
    mask = np.ones(n, dtype=bool)
    mask[nl] = False
    cr = nl[arr[np.maximum(nl - 1, 0)] == 13]
    mask[np.maximum(cr - 1, 0)] = False
    if arr[-1] == 13:  # file-final \r with no trailing newline
        mask[-1] = False
    hs, he = line_s[is_hdr], line_e[is_hdr]
    hl = he - hs
    hcsum = np.cumsum(hl)
    hidx = np.repeat(hs - (hcsum - hl), hl) + np.arange(
        int(hcsum[-1]) if len(hl) else 0, dtype=np.int64
    )
    mask[hidx] = False
    codes = dna.encode_ascii(arr[mask])
    assert len(codes) == int(offsets[-1])
    store = SequenceStore.from_flat(codes, offsets)
    if not with_headers:
        return store, None  # 7.8M small bytes objects cost ~3s + 400MB
    headers = [
        data[s + 1 : e]
        for s, e in zip(
            line_s[is_hdr].tolist(), line_e[is_hdr].tolist()
        )
    ]
    return store, headers


_KL_RE = re.compile(rb"\bKL:Z:(\d+)\b")
_OVERLAP_RE = re.compile(rb"^(\d+)M$")


def read_gfa(path: str | Path) -> tuple[SequenceStore, GfaProperties]:
    """Read unitigs from a (possibly gzipped) GFA1 file.

    Extracts k from the header ``KL:Z:<k>`` tag if present, else from the
    first L-line overlap CIGAR ``<k-1>M`` (the reference's GFA reader also
    recovers k from the file; /root/reference/src/bin.rs:874-890).
    """
    store = SequenceStore()
    header: str | None = None
    k: int | None = None
    name_to_id: dict[bytes, int] = {}
    raw_links: list[tuple[bytes, bool, bytes, bool]] = []
    with _open_maybe_gz(path) as f:
        for line in f:
            line = line.rstrip(b"\r\n")
            if not line:
                continue
            tag = line[:1]
            if tag == b"H":
                header = line.decode()
                m = _KL_RE.search(line)
                if m:
                    k = int(m.group(1))
            elif tag == b"S":
                fields = line.split(b"\t")
                if fields[2] == b"*":
                    # GFA permits S-lines without an inline sequence; tig
                    # computation must spell output sequences, so such
                    # files cannot be processed (the reference reads GFA
                    # via genome-graph, which also requires sequences to
                    # build its SequenceStore; /root/reference/src/bin.rs:892-906).
                    raise ValueError(
                        f"GFA segment {fields[1].decode()!r} has a '*' "
                        "(absent) sequence; matchtigs needs the unitig "
                        "sequences inline to spell output tigs"
                    )
                name_to_id[fields[1]] = store.add_ascii(fields[2])
            elif tag == b"L":
                fields = line.split(b"\t")
                if k is None and len(fields) >= 6:
                    m = _OVERLAP_RE.match(fields[5])
                    if m:
                        k = int(m.group(1)) + 1
                if len(fields) >= 5:
                    raw_links.append(
                        (fields[1], fields[2] == b"+", fields[3], fields[4] == b"+")
                    )
    store.finalize()
    # Resolve names after the full pass: L-lines may precede their S-lines.
    links = [
        (name_to_id[a], sa, name_to_id[b], sb)
        for a, sa, b, sb in raw_links
        if a in name_to_id and b in name_to_id
    ]
    return store, GfaProperties(k=k, header=header, links=links)


_BCALM_LINK_RE = re.compile(rb"L:([+-]):(\d+):([+-])")


def read_bcalm2(path: str | Path) -> tuple[SequenceStore, list[tuple[int, bool, int, bool]]]:
    """Read BCALM2/GGCAT fasta: sequences plus header-annotated topology.

    BCALM2 headers carry ``L:<my_strand>:<other_id>:<other_strand>`` tags
    (the reference's fast input path, /root/reference/src/bin.rs:902-915).
    """
    store = SequenceStore()
    links: list[tuple[int, bool, int, bool]] = []
    with _open_maybe_gz(path) as f:
        for uid, (head, seq) in enumerate(_iter_fasta_records(f)):
            store.add_ascii(seq)
            for m in _BCALM_LINK_RE.finditer(head):
                links.append(
                    (uid, m.group(1) == b"+", int(m.group(2)), m.group(3) == b"+")
                )
    store.finalize()
    return store, links


def load_unitigs(
    gfa_in: str | None = None,
    fa_in: str | None = None,
    bcalm_in: str | None = None,
    k: int | None = None,
) -> tuple[SequenceStore, int, str | None, list | None]:
    """CLI-style loader: exactly one input source.

    Returns (store, k, gfa_header, links): links is the explicit topology
    (GFA L-lines / BCALM2 header annotations) when the format provides one
    — the reference builds the graph from it instead of overlap hashing
    (/root/reference/src/bin.rs:874-915) — else None (plain fasta).
    """
    given = [x for x in (gfa_in, fa_in, bcalm_in) if x is not None]
    if len(given) != 1:
        raise ValueError(
            "Specify exactly one of gfa_in, fa_in, bcalm_in"
        )
    if gfa_in is not None:
        store, props = read_gfa(gfa_in)
        file_k = props.k
        if file_k is None and k is None:
            raise ValueError("GFA file does not declare k; pass k explicitly")
        if k is not None and file_k is not None and k != file_k:
            raise ValueError(f"GFA file k={file_k} conflicts with k={k}")
        return store, int(k if file_k is None else file_k), props.header, props.links
    if k is None:
        raise ValueError("k is required for fasta/bcalm input")
    if bcalm_in is not None:
        store, links = read_bcalm2(bcalm_in)
        return store, int(k), None, links
    store, _ = read_fasta(fa_in, with_headers=False)
    return store, int(k), None, None
