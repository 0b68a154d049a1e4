"""Host allocator tuning for array-churn workloads.

The pipeline's hot phases allocate and free tens-of-MB numpy arrays in
quick succession (candidate triples, sort keys, CSR scratch).  glibc
serves allocations above its mmap threshold with fresh mmap/munmap pairs,
so every such array pays a first-touch page-fault storm: measured at
bench scale (5.2M candidates), the acceptance phase alone dropped from
3.5s to 0.24s once freed arenas were reused.

``tune_malloc()`` raises the mmap threshold via ``mallopt`` so large
blocks come from the (reused) heap arena.  Trade-off: freed memory is
returned to the OS lazily, so peak RSS reporting is stickier.  Called by
the CLI and the benchmark; library users opt in explicitly.

The reference avoids the problem class by reusing per-thread Rust Vecs
(/root/reference/src/implementation/greedytigs/mod.rs:276-341); this is
the flat-numpy analog.
"""

from __future__ import annotations

import ctypes
import logging
import sys

logger = logging.getLogger(__name__)

_M_TRIM_THRESHOLD = -1  # malloc.h: M_TRIM_THRESHOLD
_M_MMAP_THRESHOLD = -3  # malloc.h: M_MMAP_THRESHOLD

_INT_MAX = (1 << 31) - 1  # mallopt takes C int

_done = False


def tune_malloc(mmap_threshold: int = _INT_MAX) -> bool:
    """Keep malloc'd pages resident for the process lifetime.

    Two knobs, both needed: M_MMAP_THRESHOLD at INT_MAX so even GB-scale
    blocks (candidate columns, native triple buffers) come from the heap
    arena instead of fresh mmap/munmap pairs, and M_TRIM_THRESHOLD at
    INT_MAX so freeing a block at the heap top does not shrink the heap.
    Without both, every repetition re-faults its big arrays; on this
    class of virtualized host a first-touch fault storm over 1.2 GB
    measured anywhere from 0.4s to 39s (host-side page ballooning).

    Trade-off: RSS stays at peak. Safe to call repeatedly (applies once)
    and a no-op on non-glibc platforms.
    """
    global _done
    if _done:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, mmap_threshold))
        ok = bool(libc.mallopt(_M_TRIM_THRESHOLD, _INT_MAX)) and ok
    except OSError:  # non-glibc libc
        return False
    if ok:
        _done = True
    else:
        logger.debug("mallopt(M_MMAP_THRESHOLD/M_TRIM_THRESHOLD) rejected")
    return ok
