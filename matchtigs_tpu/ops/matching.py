"""Deterministic greedy matching over shortest-path candidates.

Replaces the reference's online greedy matching under fine-grained node
locks (P3/P4 in SURVEY.md §2.3;
/root/reference/src/implementation/greedytigs/mod.rs:350-502): instead of
accepting paths in nondeterministic per-thread discovery order, all
candidate (out_node, in_node, distance) triples are gathered (from the
batched device SSSP) and accepted greedily in globally sorted
(distance, out_node, in_node) order — deterministic, lock-free, and at
least as good as an arbitrary discovery order.

The per-candidate acceptance rules mirror the reference's multiplicity
protocol exactly:
- ordinary out-node u: multiplicity -m[u] (m[u] <= 0), mirrored as
  +m[mirror(u)];
- unbalanced self-mirror nodes have multiplicity 1 on both sides;
- a mirror biedge (v == mirror(u)) consumes 2 units of u's deficit and is
  only allowed when the deficit is >= 2 (greedytigs/mod.rs:352-358);
- accepting u->v decrements u's out-deficit and v's in-surplus (and their
  mirrors symmetrically).
"""

from __future__ import annotations

import logging

import numpy as np

from ..graph.bigraph import Bigraph
from ..ops.candidates import Candidates

logger = logging.getLogger(__name__)


def unbalanced_nodes(g: Bigraph):
    """(out_nodes, in_node_mask, multiplicities) per the greedytig scan
    (/root/reference/src/implementation/greedytigs/mod.rs:229-245).

    out_nodes: nodes missing outgoing biedges (diff < 0) plus unbalanced
    self-mirrors; in_node_mask: nodes missing incoming biedges (diff > 0)
    plus unbalanced self-mirrors; multiplicities: the signed diff.
    """
    diff = g.imbalances()
    sm = g.self_mirror_mask()
    node_ids = np.arange(g.n_nodes, dtype=np.int64)
    sm_unbal = sm & (diff != 0)
    out_nodes = node_ids[(diff < 0) | sm_unbal]
    in_mask = (diff > 0) | sm_unbal
    return out_nodes, in_mask, diff.copy()


def greedy_accept(
    g: Bigraph,
    candidates,  # Candidates columns or int64 [M, 3] triples
    multiplicities: np.ndarray,  # signed imbalance per node (mutated)
) -> np.ndarray:
    """Accept candidate paths greedily; returns accepted [A, 3] triples.

    Candidates are sorted by (dist, out_node, in_node) before the scan, so
    the result is deterministic for a given candidate set.  The scan runs
    natively (native/tigs.cpp) with this python loop as fallback/oracle.

    A `Candidates` argument is CONSUMED: its columns are freshly allocated
    by the search phase and the packed-sort path below mutates them in
    place (sparing a 3-column copy — ~1.2 GB of traffic at 51M rows).
    """
    if isinstance(candidates, list):
        total = sum(len(c) for c in candidates)
        if total == 0:
            return np.empty((0, 3), dtype=np.int64)
        fused = _native_accept_chunks_fused(g, candidates, multiplicities)
        if fused is not None:
            return fused
        sorted_cols = _native_sort_packed_chunks(g, candidates)
        if sorted_cols is not None:
            cu, cv, cd = sorted_cols
            try:
                return _greedy_accept_native(g, None, cu, cv, cd,
                                             multiplicities)
            except ImportError:  # unreachable: chunks path implies native
                return greedy_accept_scan_py(
                    g, np.stack([cu, cv, cd], axis=1), multiplicities
                )
        candidates = Candidates.concat(candidates)
    if len(candidates) == 0:
        return np.empty((0, 3), dtype=np.int64)
    if isinstance(candidates, Candidates):
        cu, cv, cd = candidates.u, candidates.v, candidates.d
    else:
        # Work on contiguous columns: column views of an [M, 3] array are
        # stride-24 and cost tens of seconds in elementwise ops / gathers
        # at 50M+ candidates.  Real copies (not views): the packed-sort
        # path below mutates them in place.
        cu = candidates[:, 0].astype(np.int64, copy=True)
        cv = candidates[:, 1].astype(np.int64, copy=True)
        cd = candidates[:, 2].astype(np.int64, copy=True)
    if g.n_nodes < (1 << 28) and int(cd.max(initial=0)) < 128:
        # The packed key holds the whole triple (d:8 | u:28 | v:28), so
        # sorting key VALUES yields the sorted candidates directly --
        # unpacking sorted keys is sequential, where sorting an index
        # permutation costs 3x 0.4GB random gathers (or the equivalent
        # scan indirection) at 50M candidates.
        order = None
        if not _native_sort_packed(cu, cv, cd):
            # numpy fallback: all pack/unpack steps are in-place into the
            # three column buffers (fresh tens-of-MB allocations cost
            # more in first-touch page faults than the arithmetic does;
            # measured 3.5s -> 0.9s cold at 5.2M rows).
            key = cd  # cd's buffer becomes the key, then dist again
            key <<= 56
            np.left_shift(cu, 28, out=cu)
            key |= cu
            key |= cv
            key.sort()
            np.bitwise_and(key, np.int64((1 << 28) - 1), out=cv)
            np.right_shift(key, 28, out=cu)
            cu &= np.int64((1 << 28) - 1)
            key >>= 56  # cd = dist again
    else:
        order = np.lexsort((cv, cu, cd))
    try:
        return _greedy_accept_native(g, order, cu, cv, cd, multiplicities)
    except ImportError:
        logger.warning("native tigs pass unavailable; using python fallback")
        if order is not None:
            cu, cv, cd = cu[order], cv[order], cd[order]
        return greedy_accept_scan_py(
            g, np.stack([cu, cv, cd], axis=1), multiplicities
        )


def _native_accept_chunks_fused(g, chunks, m):
    """Fully fused chunk-concat + pack + MT radix + packed MT acceptance
    scan (radix.cpp:accept_chunks_scan_packed): only the ACCEPTED triples
    are ever unpacked.  The full-width (cu, cv, cd) columns this skips
    moved ~2.4GB at 51M candidates for ~1M accepted rows — the accept
    phase's dominant traffic.  Returns accepted [A, 3] triples (and
    mutates `m`), or None when ineligible (same range limits as the
    packed sort, too small, or no native library)."""
    import ctypes
    import os

    total = sum(len(c) for c in chunks)
    if total < (1 << 22) or g.n_nodes >= (1 << 28):
        return None
    if any(int(c.d.max(initial=0)) >= 128 for c in chunks if len(c)):
        return None
    try:
        from .. import native

        lib = native.load()
    except ImportError:
        return None
    live = [c for c in chunks if len(c)]
    cols = []
    for name in ("u", "v", "d"):
        cols.append([
            np.ascontiguousarray(getattr(c, name), dtype=np.int64)
            for c in live
        ])
    llp = ctypes.POINTER(ctypes.c_longlong)
    ptrs = [
        (llp * len(live))(*[native.as_ll_ptr(a) for a in col])
        for col in cols
    ]
    lens = np.array([len(c) for c in live], dtype=np.int64)
    # Under the mirror invariant (m[mirror[x]] == -m[x]; self-mirror m in
    # [0, 1]) every accept consumes >= 1 unit of total out-deficit, so the
    # deficit sum bounds the accept count.  The scan runs on a PRIVATE
    # copy of m so a -2 (cap overflow, only reachable when the invariant
    # is violated) cannot leak partial multiplicity updates into the
    # caller's array before the non-fused fallback reruns the scan.
    m64 = np.array(m, dtype=np.int64)
    sm = np.ascontiguousarray(g.self_mirror_mask(), dtype=np.int8)
    deficit = np.where(sm != 0, np.maximum(m64, 0), np.maximum(-m64, 0))
    cap = int(deficit.sum()) + 1
    u_out = np.empty(cap, dtype=np.int64)
    v_out = np.empty(cap, dtype=np.int64)
    d_out = np.empty(cap, dtype=np.int64)
    mirror = np.ascontiguousarray(g.mirror_node, dtype=np.int64)
    p = native.as_ll_ptr
    n_acc = lib.accept_chunks_scan_packed(
        len(live), ptrs[0], ptrs[1], ptrs[2], p(lens),
        p(m64), p(mirror), native.as_i8_ptr(sm),
        p(u_out), p(v_out), p(d_out), cap,
        min(os.cpu_count() or 1, 16), 1 << 19,
    )
    if n_acc < 0:
        return None
    m[:] = m64
    return np.stack(
        [u_out[:n_acc], v_out[:n_acc], d_out[:n_acc]], axis=1
    )


def pack_accept_keys(chunks) -> np.ndarray | None:
    """Pack candidate chunks into the acceptance sort key
    (``d << 56 | u << 28 | v``, int64, unsorted) — the exchange format of
    the mesh-sharded acceptance sort (parallel/mesh.py).  None when the
    ids/dists exceed the packed ranges."""
    live = [c for c in chunks if len(c)]
    if not live:
        return np.empty(0, dtype=np.int64)
    if any(int(c.d.max(initial=0)) >= 128 for c in live):
        return None
    if any(
        int(c.u.max(initial=0)) >= (1 << 28)
        or int(c.v.max(initial=0)) >= (1 << 28)
        for c in live
    ):
        return None
    return np.concatenate(
        [
            (c.d.astype(np.int64) << 56)
            | (c.u.astype(np.int64) << 28)
            | c.v.astype(np.int64)
            for c in live
        ]
    )


def greedy_accept_sorted_keys(
    g: Bigraph, keys: np.ndarray, m: np.ndarray
) -> np.ndarray:
    """Acceptance scan over PRE-SORTED packed keys (``d << 56 | u << 28 |
    v``): the packed MT scan (native/tigs.cpp:greedy_accept_scan_packed_mt)
    consumes them directly.  The consumer of the mesh-sharded acceptance
    sort; identical accepted set as greedy_accept on the unpacked triples
    (parity-tested).  Mutates ``m``; returns accepted [A, 3] triples."""
    import ctypes
    import os

    if len(keys) == 0:
        return np.empty((0, 3), dtype=np.int64)
    from .. import native

    lib = native.load()
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    mask28 = np.uint64((1 << 28) - 1)
    u_max = int(((keys >> np.uint64(28)) & mask28).max())
    v_max = int((keys & mask28).max())
    if max(u_max, v_max) >= g.n_nodes:
        raise ValueError(
            f"packed key node id {max(u_max, v_max)} out of range "
            f"(n_nodes={g.n_nodes})"
        )
    m64 = np.array(m, dtype=np.int64)
    sm = np.ascontiguousarray(g.self_mirror_mask(), dtype=np.int8)
    deficit = np.where(sm != 0, np.maximum(m64, 0), np.maximum(-m64, 0))
    cap = int(deficit.sum()) + 1
    u_out = np.empty(cap, dtype=np.int64)
    v_out = np.empty(cap, dtype=np.int64)
    d_out = np.empty(cap, dtype=np.int64)
    mirror = np.ascontiguousarray(g.mirror_node, dtype=np.int64)
    p = native.as_ll_ptr
    n_acc = lib.greedy_accept_scan_packed_mt(
        len(keys),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_ulonglong)),
        p(m64), p(mirror), native.as_i8_ptr(sm),
        p(u_out), p(v_out), p(d_out), cap,
        min(os.cpu_count() or 1, 16), 1 << 19,
    )
    if n_acc < 0:
        raise RuntimeError(f"packed acceptance scan failed ({n_acc})")
    m[:] = m64
    return np.stack(
        [u_out[:n_acc], v_out[:n_acc], d_out[:n_acc]], axis=1
    )


def _native_sort_packed_chunks(g, chunks):
    """Fused chunk-concat + pack + MT radix + unpack
    (radix.cpp:accept_sort_packed_chunks): the separate three-column
    1.2GB concatenation it replaces was the device-led path's largest
    remaining page-fault surface at 60M bases.  Returns the sorted
    (cu, cv, cd) columns, or None when ineligible (ids/dists out of the
    packed range, too small, or no native library)."""
    import ctypes
    import os

    total = sum(len(c) for c in chunks)
    if total < (1 << 22) or g.n_nodes >= (1 << 28):
        return None
    if any(int(c.d.max(initial=0)) >= 128 for c in chunks if len(c)):
        return None
    try:
        from .. import native

        lib = native.load()
    except ImportError:
        return None
    live = [c for c in chunks if len(c)]
    cols = []
    for name in ("u", "v", "d"):
        cols.append([
            np.ascontiguousarray(getattr(c, name), dtype=np.int64)
            for c in live
        ])
    llp = ctypes.POINTER(ctypes.c_longlong)
    ptrs = [
        (llp * len(live))(*[native.as_ll_ptr(a) for a in col])
        for col in cols
    ]
    lens = np.array([len(c) for c in live], dtype=np.int64)
    cu = np.empty(total, dtype=np.int64)
    cv = np.empty(total, dtype=np.int64)
    cd = np.empty(total, dtype=np.int64)
    p = native.as_ll_ptr
    rc = lib.accept_sort_packed_chunks(
        len(live), ptrs[0], ptrs[1], ptrs[2], p(lens),
        p(cu), p(cv), p(cd), min(os.cpu_count() or 1, 16),
    )
    if rc != 0:
        return None
    return cu, cv, cd


def _native_sort_packed(cu, cv, cd) -> bool:
    """In-place (d, u, v) value sort of the three candidate columns via
    the native MT pack + 16-bit LSD radix + unpack
    (radix.cpp:accept_sort_packed) — one MT pass each way instead of
    three single-threaded 400MB numpy passes around an AVX np.sort
    (~1.6s -> ~0.5s at 51M rows).  False when unavailable or too small
    to pay the thread spawns."""
    if len(cu) < (1 << 20):
        return False
    try:
        from .. import native

        lib = native.load()
    except ImportError:
        return False
    import os

    p = native.as_ll_ptr
    return (
        lib.accept_sort_packed(
            len(cu), p(cu), p(cv), p(cd), min(os.cpu_count() or 1, 16)
        )
        == 0
    )


def _greedy_accept_native(
    g: Bigraph,
    order: np.ndarray | None,
    cu: np.ndarray,
    cv: np.ndarray,
    cd: np.ndarray,
    m: np.ndarray,
) -> np.ndarray:
    """Scan candidates (in `order` if given, else already sorted);
    returns accepted [A, 3] rows in original coordinates."""
    import os

    from .. import native

    lib = native.load()
    M = len(cu)
    if order is not None:
        order = np.ascontiguousarray(order, dtype=np.int64)
    m64 = np.ascontiguousarray(m, dtype=np.int64)
    mirror = np.ascontiguousarray(g.mirror_node, dtype=np.int64)
    sm = np.ascontiguousarray(g.self_mirror_mask(), dtype=np.int8)
    accepted = np.empty(M, dtype=np.int64)
    p = native.as_ll_ptr
    if order is None and M >= (1 << 21):
        # Pre-sorted big scans run the chunked-speculation MT variant
        # (exact: multiplicity monotonicity makes snapshot rejects
        # permanent; identical accepted set, parity-tested).
        n_acc = lib.greedy_accept_scan_mt(
            M, p(cu), p(cv), p(cd), p(m64), p(mirror),
            native.as_i8_ptr(sm), p(accepted),
            min(os.cpu_count() or 1, 16), 1 << 19,
        )
    else:
        n_acc = lib.greedy_accept_scan_perm(
            M, None if order is None else p(order), p(cu), p(cv), p(cd),
            p(m64), p(mirror), native.as_i8_ptr(sm), p(accepted),
        )
    m[:] = m64  # propagate multiplicity updates to the caller's array
    sel = accepted[:n_acc]
    return np.stack([cu[sel], cv[sel], cd[sel]], axis=1)


def greedy_accept_scan_py(
    g: Bigraph, cands: np.ndarray, multiplicities: np.ndarray
) -> np.ndarray:
    """Python oracle for the native scan; expects pre-sorted candidates."""
    m = multiplicities
    mirror = g.mirror_node
    sm = g.self_mirror_mask()
    accepted: list[tuple[int, int, int]] = []

    for u, v, d in cands.tolist():
        u_sm = bool(sm[u])
        mu = int(mirror[u])
        is_mirror_edge = (v == mu) and not u_sm

        if u_sm:
            out_mult = m[u]  # in [0, 1]
        else:
            out_mult = -m[u]
        if out_mult <= 0:
            continue
        if is_mirror_edge:
            if out_mult < 2:
                continue
        else:
            v_sm = bool(sm[v])
            in_mult = m[v]
            if in_mult <= 0:
                continue

        # accept
        accepted.append((u, v, d))
        red = 2 if is_mirror_edge else 1
        if u_sm:
            m[u] -= 1
        else:
            m[u] += red
            m[mu] -= red
        if not is_mirror_edge:
            m[v] -= 1
            if not v_sm:
                m[int(mirror[v])] += 1

    if not accepted:
        return np.empty((0, 3), dtype=np.int64)
    return np.asarray(accepted, dtype=np.int64)
