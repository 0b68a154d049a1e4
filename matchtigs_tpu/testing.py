"""Synthetic data generation and oracle checks.

The reference repo ships no fixtures; its real test oracle is k-mer-set
equivalence of the spelled tigs (SURVEY.md §4).  This module generates
random genomes, extracts their maximal unitigs (a minimal BCALM2-style
compactor over canonical k-mers), and provides the k-mer-set oracle used
by the test-suite and benchmarks.

Packed-integer generators cover k <= 31 (uint64) and k <= 63 (two-word);
make_unitig_store_strings covers arbitrary k for tiny inputs.
"""

from __future__ import annotations

import numpy as np

from .graph.bigraph import Bigraph
from .io.sequence_store import SequenceStore
from .utils import dna


def random_genome(length: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, size=length, dtype=np.uint8)


def random_genome_with_repeats(
    length: int,
    seed: int = 0,
    repeat_len: int = 300,
    n_families: int = 3,
    copies_per_family: int = 200,
    divergence: float = 0.03,
) -> np.ndarray:
    """Random genome with interspersed diverged repeat families.

    Real genomes are repeat-rich; repeat families create dense tangles in
    the de Bruijn graph where bounded shortest-path searches expand large
    balls — the regime the reference's resource-limited staged parallelism
    exists for (greedytigs/mod.rs:537-644) and where batched device search
    pays off.
    """
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=length, dtype=np.uint8)
    families = [
        rng.integers(0, 4, size=repeat_len, dtype=np.uint8)
        for _ in range(n_families)
    ]
    # interspersed repeats (LINE/SINE-like): diverged copies scattered
    for fam in families:
        positions = rng.integers(0, length - repeat_len, size=copies_per_family)
        for pos in positions:
            copy = fam.copy()
            muts = np.flatnonzero(rng.random(repeat_len) < divergence)
            copy[muts] = (
                copy[muts] + rng.integers(1, 4, size=len(muts), dtype=np.uint8)
            ) % 4
            genome[pos : pos + repeat_len] = copy
    # tandem satellite arrays (alpha-satellite-like): ~171bp units repeated
    # in place with small divergence -- the dense-tangle regime where the
    # de Bruijn graph becomes a hairball of short unitigs and bounded
    # searches expand large balls
    unit_len = 171
    n_arrays = max(1, length // 2_000_000)
    array_copies = min(400, max(0, (length - 1) // unit_len))
    for _ in range(n_arrays):
        if array_copies < 2:
            break
        unit = rng.integers(0, 4, size=unit_len, dtype=np.uint8)
        arr_len = unit_len * array_copies
        pos = int(rng.integers(0, max(1, length - arr_len)))
        for c in range(array_copies):
            copy = unit.copy()
            muts = np.flatnonzero(rng.random(unit_len) < 0.02)
            copy[muts] = (
                copy[muts] + rng.integers(1, 4, size=len(muts), dtype=np.uint8)
            ) % 4
            genome[pos + c * unit_len : pos + (c + 1) * unit_len] = copy
    return genome


def mutate_genome(genome: np.ndarray, rate: float, seed: int = 0) -> np.ndarray:
    """Substitution-mutated copy of a genome (pangenome-strain analog)."""
    rng = np.random.default_rng(seed)
    out = genome.copy()
    pos = np.flatnonzero(rng.random(len(genome)) < rate)
    out[pos] = (out[pos] + rng.integers(1, 4, size=len(pos), dtype=np.uint8)) % 4
    return out


def make_pangenome_store(
    genome_length: int,
    k: int,
    n_strains: int = 4,
    mutation_rate: float = 0.005,
    seed: int = 0,
    cache_dir: str | None = None,
    with_repeats: bool = False,
) -> tuple["SequenceStore", np.ndarray, int]:
    """Reference genome + mutated strains -> unitig store (BASELINE.json
    config-5 analog: pangenome unitigs with bubble-rich topology;
    `with_repeats` adds diverged repeat families for realistic dense
    tangles).

    With `cache_dir`, the deterministic result is cached on disk keyed by
    the parameters (generation is memory-bandwidth-bound at 10M+ scales).
    """
    cache_path = None
    if cache_dir is not None:
        from pathlib import Path

        rep = "_rep" if with_repeats else ""
        key = f"pan_{genome_length}_{k}_{n_strains}_{mutation_rate}_{seed}{rep}"
        cache_path = Path(cache_dir) / f"{key}.npz"
        if cache_path.exists():
            data = np.load(cache_path)
            store = SequenceStore.from_flat(data["codes"], data["offsets"])
            return store, data["kmers"], k

    if with_repeats:
        base = random_genome_with_repeats(
            genome_length,
            seed=seed,
            copies_per_family=max(20, genome_length // 25000),
        )
    else:
        base = random_genome(genome_length, seed=seed)
    kmer_parts = [kmer_set_of_codes(base, k)]
    for i in range(1, n_strains):
        strain = mutate_genome(base, mutation_rate, seed=seed + 1000 + i)
        kmer_parts.append(kmer_set_of_codes(strain, k))
    kmers = np.unique(np.concatenate(kmer_parts))
    unitigs = unitigs_from_kmers(kmers, k)
    store = SequenceStore()
    for u in unitigs:
        store.add(u)
    store.finalize()
    if cache_path is not None:
        cache_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(cache_path, codes=store.codes, offsets=store.offsets, kmers=kmers)
    return store, kmers, k


def _pairs_to_void(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) uint64 pairs -> void16 keys whose memcmp order is the
    numeric lexicographic order (big-endian fields)."""
    a = np.empty(len(hi), dtype=[("h", ">u8"), ("l", ">u8")])
    a["h"] = hi
    a["l"] = lo
    return a.view("V16").reshape(-1)


def _void_to_pairs(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    a = v.view([("h", ">u8"), ("l", ">u8")])
    return a["h"].astype(np.uint64), a["l"].astype(np.uint64)


def kmer_set_of_codes(codes: np.ndarray, k: int) -> np.ndarray:
    """Sorted unique canonical packed k-mers of one sequence.

    k <= 31: 1-D uint64; 31 < k <= 63: 1-D void16 keys (two-word packing).
    """
    if k <= 31:
        packed = dna.pack_kmers_u64(codes, k)
        return np.unique(dna.canonical_packed_u64(packed, k))
    hi, lo = dna.pack_kmers_2x64(codes, k)
    chi, clo = dna.canonical_packed_2x64(hi, lo, k)
    return np.unique(_pairs_to_void(chi, clo))


def kmer_multiset_of_walk_seqs(seqs: list[np.ndarray], k: int) -> np.ndarray:
    """Sorted canonical packed k-mers (with duplicates) over sequences."""
    if k <= 31:
        parts = [
            dna.canonical_packed_u64(dna.pack_kmers_u64(s, k), k)
            for s in seqs
            if len(s) >= k
        ]
        if not parts:
            return np.empty(0, dtype=np.uint64)
        return np.sort(np.concatenate(parts))
    parts = []
    for s in seqs:
        if len(s) < k:
            continue
        hi, lo = dna.pack_kmers_2x64(s, k)
        chi, clo = dna.canonical_packed_2x64(hi, lo, k)
        parts.append(_pairs_to_void(chi, clo))
    if not parts:
        return np.empty(0, dtype="V16")
    return np.sort(np.concatenate(parts))


def unitigs_from_kmers(kmers: np.ndarray, k: int) -> list[np.ndarray]:
    """Extract maximal unitigs from a canonical k-mer set.

    Returns a list of code arrays, one per unitig, canonical orientation
    (seq <= revcomp(seq) lexicographically on the packed form).
    k <= 31 takes the uint64 fast path; 31 < k <= 63 the two-word path.
    """
    if k > 31:
        return _unitigs_from_kmers_2x64(kmers, k)
    kmers = np.unique(kmers.astype(np.uint64))
    rc = dna.revcomp_packed_u64(kmers, k)
    oriented = np.unique(np.concatenate([kmers, rc]))  # all oriented k-mers
    n = len(oriented)
    mask = np.uint64((1 << (2 * k)) - 1)

    def find(vals: np.ndarray) -> np.ndarray:
        """Index into `oriented` or -1."""
        idx = np.searchsorted(oriented, vals)
        idx_c = np.clip(idx, 0, n - 1)
        ok = oriented[idx_c] == vals
        return np.where(ok, idx_c, -1).astype(np.int64)

    # Successor/predecessor degrees without materializing [n, 4] tables:
    # accumulate counts and the successor-index sum (the sum IS the unique
    # successor when out_deg == 1).
    out_deg = np.zeros(n, dtype=np.uint8)
    in_deg = np.zeros(n, dtype=np.uint8)
    succ_sum = np.zeros(n, dtype=np.int64)
    for c in range(4):
        sv = ((oriented << np.uint64(2)) | np.uint64(c)) & mask
        idx = find(sv)
        hit = idx >= 0
        out_deg += hit
        succ_sum += np.where(hit, idx, 0)
        pv = (oriented >> np.uint64(2)) | (np.uint64(c) << np.uint64(2 * (k - 1)))
        in_deg += find(pv) >= 0
    rc_idx = find(dna.revcomp_packed_u64(oriented, k))
    assert np.all(rc_idx >= 0)

    # Contracted edge i -> j: both are forced (out_deg[i] == 1,
    # in_deg[j] == 1) and j != rc(i) (BCALM2 palindrome rule: a unitig may
    # not contain a k-mer and its reverse complement).
    uniq_succ = np.where(out_deg == 1, succ_sum, -1)
    contracted = (
        (uniq_succ >= 0)
        & (in_deg[np.clip(uniq_succ, 0, n - 1)] == 1)
        & (uniq_succ != rc_idx)
    )
    nxt = np.where(contracted, uniq_succ, -1).astype(np.int64)
    has_contracted_in = np.zeros(n, dtype=bool)
    has_contracted_in[nxt[nxt >= 0]] = True
    starts = np.flatnonzero(~has_contracted_in).astype(np.int64)

    # Chain following (native C++ with python fallback).
    order, offsets = _follow_chains(n, nxt, starts)

    # Materialize sequences vectorized: chain = first kmer + one base per
    # further node; deduplicate reverse-complement twins.
    last_bases = (oriented[order] & np.uint64(3)).astype(np.uint8)
    shifts = np.uint64(2) * (np.uint64(k - 1) - np.arange(k, dtype=np.uint64))
    out: list[np.ndarray] = []
    seen: set[bytes] = set()
    prev = 0
    for end in offsets.tolist():
        first = oriented[order[prev]]
        head = ((first >> shifts) & np.uint64(3)).astype(np.uint8)
        arr = np.concatenate([head, last_bases[prev + 1 : end]])
        prev = end
        fwd = arr.tobytes()
        rc = dna.revcomp(arr)
        bwd = rc.tobytes()
        key = min(fwd, bwd)
        if key in seen:
            continue
        seen.add(key)
        out.append(arr if fwd <= bwd else rc)
    return out


def _unitigs_from_kmers_2x64(kmers: np.ndarray, k: int) -> list[np.ndarray]:
    """Two-word-packed unitig extraction for 31 < k <= 63 (same contraction
    rules as the uint64 path, incl. the BCALM2 palindrome stop)."""
    assert 31 < k <= 63
    k_lo, k_hi = 32, k - 32
    mask_hi = np.uint64((1 << (2 * k_hi)) - 1)
    kv = np.unique(np.asarray(kmers).view("V16").reshape(-1))
    hi, lo = _void_to_pairs(kv)
    rhi, rlo = dna.revcomp_packed_2x64(hi, lo, k)
    oriented_v = np.unique(
        np.concatenate([_pairs_to_void(hi, lo), _pairs_to_void(rhi, rlo)])
    )
    ohi, olo = _void_to_pairs(oriented_v)
    n = len(oriented_v)

    def find(vh: np.ndarray, vl: np.ndarray) -> np.ndarray:
        vv = _pairs_to_void(vh, vl)
        idx = np.searchsorted(oriented_v, vv)
        idx_c = np.clip(idx, 0, n - 1)
        ok = oriented_v[idx_c] == vv
        return np.where(ok, idx_c, -1).astype(np.int64)

    out_deg = np.zeros(n, dtype=np.uint8)
    in_deg = np.zeros(n, dtype=np.uint8)
    succ_sum = np.zeros(n, dtype=np.int64)
    two = np.uint64(2)
    for c in range(4):
        cc = np.uint64(c)
        # successor: shift left 2 within 2k bits, append base c
        sh = ((ohi << two) | (olo >> np.uint64(62))) & mask_hi
        sl = (olo << two) | cc
        idx = find(sh, sl)
        hit = idx >= 0
        out_deg += hit
        succ_sum += np.where(hit, idx, 0)
        # predecessor: shift right 2, prepend base c
        pl = (olo >> two) | ((ohi & np.uint64(3)) << np.uint64(62))
        ph = (ohi >> two) | (cc << np.uint64(2 * (k_hi - 1)))
        in_deg += find(ph, pl) >= 0
    rc_ohi, rc_olo = dna.revcomp_packed_2x64(ohi, olo, k)
    rc_idx = find(rc_ohi, rc_olo)
    assert np.all(rc_idx >= 0)

    uniq_succ = np.where(out_deg == 1, succ_sum, -1)
    contracted = (
        (uniq_succ >= 0)
        & (in_deg[np.clip(uniq_succ, 0, n - 1)] == 1)
        & (uniq_succ != rc_idx)
    )
    nxt = np.where(contracted, uniq_succ, -1).astype(np.int64)
    has_in = np.zeros(n, dtype=bool)
    has_in[nxt[nxt >= 0]] = True
    starts = np.flatnonzero(~has_in).astype(np.int64)
    order, offsets = _follow_chains(n, nxt, starts)

    last_bases = (olo[order] & np.uint64(3)).astype(np.uint8)
    out: list[np.ndarray] = []
    seen: set[bytes] = set()
    prev = 0
    for end in offsets.tolist():
        fh, fl = int(ohi[order[prev]]), int(olo[order[prev]])
        head = np.empty(k, dtype=np.uint8)
        for j in range(k_hi):
            head[j] = (fh >> (2 * (k_hi - 1 - j))) & 3
        for j in range(k_lo):
            head[k_hi + j] = (fl >> (2 * (k_lo - 1 - j))) & 3
        arr = np.concatenate([head, last_bases[prev + 1 : end]])
        prev = end
        fwd = arr.tobytes()
        rc = dna.revcomp(arr)
        bwd = rc.tobytes()
        key = min(fwd, bwd)
        if key in seen:
            continue
        seen.add(key)
        out.append(arr if fwd <= bwd else rc)
    return out


def _follow_chains(n: int, nxt: np.ndarray, starts: np.ndarray):
    """(order, chain end offsets) via native follow_chains or python."""
    try:
        from . import native

        lib = native.load()
        order = np.empty(n, dtype=np.int64)
        offsets = np.empty(n + 1, dtype=np.int64)
        p = native.as_ll_ptr
        n_chains = lib.follow_chains(
            n, p(np.ascontiguousarray(nxt)), len(starts),
            p(np.ascontiguousarray(starts)), p(order), p(offsets),
        )
        return order, offsets[:n_chains]
    except ImportError:
        visited = np.zeros(n, dtype=bool)
        order_l: list[int] = []
        offsets_l: list[int] = []

        def walk(u: int) -> None:
            while u >= 0 and not visited[u]:
                visited[u] = True
                order_l.append(u)
                u = int(nxt[u])
            offsets_l.append(len(order_l))

        for s in starts.tolist():
            if not visited[s]:
                walk(s)
        for u in range(n):
            if not visited[u]:
                walk(u)
        return np.asarray(order_l, dtype=np.int64), np.asarray(
            offsets_l, dtype=np.int64
        )


def make_unitig_store(
    genome_length: int = 20000, k: int = 15, seed: int = 0, n_sequences: int = 1
) -> tuple[SequenceStore, np.ndarray, int]:
    """Random genome(s) -> (unitig SequenceStore, canonical kmer set, k)."""
    kmer_parts = []
    for i in range(n_sequences):
        genome = random_genome(genome_length, seed=seed + i)
        kmer_parts.append(kmer_set_of_codes(genome, k))
    kmers = np.unique(np.concatenate(kmer_parts))
    unitigs = unitigs_from_kmers(kmers, k)
    store = SequenceStore()
    for u in unitigs:
        store.add(u)
    store.finalize()
    return store, kmers, k


def spelled_kmers(
    g: Bigraph, tigs: list[np.ndarray], store: SequenceStore, k: int
) -> np.ndarray:
    """Sorted canonical k-mer multiset spelled by the tigs."""
    from .io.writers import spell_walk

    seqs = [spell_walk(g, t, store, k) for t in tigs]
    return kmer_multiset_of_walk_seqs(seqs, k)


def assert_tigs_spell_kmer_set(
    g: Bigraph,
    tigs: list[np.ndarray],
    store: SequenceStore,
    k: int,
    kmers: np.ndarray,
    allow_duplicates: bool,
) -> None:
    got = spelled_kmers(g, tigs, store, k)
    got_set = np.unique(got)
    expected = (
        np.unique(kmers.astype(np.uint64))
        if k <= 31
        else np.unique(np.asarray(kmers).view("V16").reshape(-1))
    )
    assert got_set.shape == expected.shape and np.all(got_set == expected), (
        f"spelled kmer set mismatch: got {len(got_set)} expected {len(expected)}"
    )
    if not allow_duplicates:
        assert len(got) == len(expected), (
            f"duplicate kmers spelled: {len(got)} vs {len(expected)} unique"
        )


def make_unitig_store_strings(
    genome_length: int, k: int, seed: int = 0, n_sequences: int = 2
) -> tuple["SequenceStore", set, int]:
    """Arbitrary-k unitig generator over python string k-mers (slow; for
    tiny end-to-end tests in the k > 63 band where the packed-integer
    generators do not reach).  Returns (store, canonical kmer string set, k).
    """
    from .utils import dna

    def canon(s: str) -> str:
        rc = s[::-1].translate(str.maketrans("ACGT", "TGCA"))
        return min(s, rc)

    kmers: set[str] = set()
    for i in range(n_sequences):
        genome = dna.decode_to_ascii(random_genome(genome_length, seed=seed + i)).decode()
        for j in range(len(genome) - k + 1):
            kmers.add(canon(genome[j : j + k]))

    # maximal unitigs: follow unique successors over the bidirected kmer graph
    def succs(s: str):
        for c in "ACGT":
            nxt = s[1:] + c
            if canon(nxt) in kmers:
                yield nxt

    def preds(s: str):
        for c in "ACGT":
            prv = c + s[:-1]
            if canon(prv) in kmers:
                yield prv

    def rc(s: str) -> str:
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))

    visited: set[str] = set()
    unitigs: list[str] = []
    for km in sorted(kmers):
        if km in visited:
            continue
        # extend forward and backward while the chain is unbranched
        chain = [km]
        cur = km
        while True:
            ss = list(succs(cur))
            if len(ss) != 1:
                break
            nxt = ss[0]
            if canon(nxt) in visited or canon(nxt) == canon(km):
                break
            if len(list(preds(nxt))) != 1:
                break
            chain.append(nxt)
            visited.add(canon(nxt))
            cur = nxt
        cur = km
        while True:
            pp = list(preds(cur))
            if len(pp) != 1:
                break
            prv = pp[0]
            if canon(prv) in visited or canon(prv) == canon(km):
                break
            if len(list(succs(prv))) != 1:
                break
            chain.insert(0, prv)
            visited.add(canon(prv))
            cur = prv
        visited.add(canon(km))
        seq = chain[0] + "".join(s[-1] for s in chain[1:])
        unitigs.append(seq)

    store = SequenceStore()
    for u in unitigs:
        store.add_ascii(u.encode())
    store.finalize()
    return store, kmers, k
