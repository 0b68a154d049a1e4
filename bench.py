"""Benchmark: greedy matchtigs throughput on the available device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "unitigs/s", "vs_baseline": N}

Dataset: synthetic pangenome unitigs (10M-base genome, 7 strains, 1%
mutations, k=31 -- the BASELINE.json config-5 analog; no external datasets
are reachable from this environment).  Deterministic; cached on disk after
the first generation.

value: unitigs processed per second by the full greedy-matchtigs compute
(batched bounded SSSP on device + deterministic greedy matching + Euler
stitching on host), measured after one warmup batch (compile excluded, as
steady-state throughput).

vs_baseline: ratio against a single-thread native (C++) host baseline
that mirrors the reference's per-source binary-heap Dijkstra design
(BASELINE.md: the reference publishes no numbers, so the baseline is
measured in-run: the same candidate collection via the native host
Dijkstra, then the same matching + Euler host passes).
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.WARNING)

# Persistent compilation cache: first-compile over the axon tunnel takes
# ~5 min; later bench runs reuse the executable.
import jax

CACHE_DIR = Path(__file__).parent / ".jax_cache"
CACHE_DIR.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from matchtigs_tpu import testing
from matchtigs_tpu.algos.greedytigs import GreedytigConfig, compute_greedytigs
from matchtigs_tpu.graph.build import build_bigraph_from_unitigs
from matchtigs_tpu.ops.device_graph import build_device_graph
from matchtigs_tpu.ops.matching import greedy_accept, unbalanced_nodes
from matchtigs_tpu.ops.sssp import batched_bounded_sssp, sssp_reference_host

GENOME_LENGTH = 10_000_000
K = 31
N_STRAINS = 7
MUTATION_RATE = 0.01
SEED = 0
CAPACITY = 16
BATCH_SIZE = 8192
BASELINE_SAMPLE = 65536  # C++ MT baseline sample
DATA_CACHE = str(Path(__file__).parent / ".bench_data")


def main() -> None:
    t0 = time.monotonic()
    store, kmers, k = testing.make_pangenome_store(
        genome_length=GENOME_LENGTH,
        k=K,
        n_strains=N_STRAINS,
        mutation_rate=MUTATION_RATE,
        seed=SEED,
        cache_dir=DATA_CACHE,
        with_repeats=True,
    )
    n_unitigs = len(store)
    g = build_bigraph_from_unitigs(store, k)
    out_nodes, in_mask, mult = unbalanced_nodes(g)
    print(
        f"setup: {time.monotonic() - t0:.1f}s, {n_unitigs} unitigs, "
        f"{len(kmers)} kmers, {len(out_nodes)} sources on {jax.devices()[0]}",
        file=sys.stderr,
    )

    # Warmup / compile the single device program shape (overflow tail is
    # finished on host, so no other shape is ever needed).
    dg = build_device_graph(g)
    t0 = time.monotonic()
    batched_bounded_sssp(
        dg,
        out_nodes[:BATCH_SIZE],
        max_weight=k - 1,
        capacity=CAPACITY,
        batch_size=BATCH_SIZE,
    )
    print(f"warmup(compile): {time.monotonic() - t0:.1f}s", file=sys.stderr)

    # Timed: the full greedy-matchtigs compute (candidates captured for
    # the baseline's matching+euler measurement).
    import matchtigs_tpu.algos.greedytigs as gt

    _CANDS = [None]
    _orig_collect = gt.collect_candidates

    def _capture(*args, **kw):
        _CANDS[0] = _orig_collect(*args, **kw)
        return _CANDS[0]

    gt.collect_candidates = _capture
    g_run = g.copy()
    t0 = time.monotonic()
    tigs = compute_greedytigs(
        g_run,
        GreedytigConfig(k=k, initial_capacity=CAPACITY, batch_size=BATCH_SIZE),
    )
    gt.collect_candidates = _orig_collect
    elapsed = time.monotonic() - t0
    unitigs_per_s = n_unitigs / elapsed
    kmers_per_s = len(kmers) / elapsed
    print(
        f"device greedytigs: {elapsed:.2f}s -> {unitigs_per_s:.0f} unitigs/s, "
        f"{kmers_per_s:.0f} kmers/s, {len(tigs)} tigs",
        file=sys.stderr,
    )

    # Host baseline: single-thread native C++ heap Dijkstra (reference
    # design), extrapolated from a sample, plus measured matching+Euler.
    from matchtigs_tpu.ops.sssp import host_dijkstra_candidates

    sample = out_nodes[:BASELINE_SAMPLE]
    t0 = time.monotonic()
    host_dijkstra_candidates(dg, sample, k - 1, in_mask)
    host_sssp_time = (time.monotonic() - t0) * (len(out_nodes) / len(sample))
    # matching + euler host-side time, measured on the device candidates.
    from matchtigs_tpu.algos.greedytigs import collect_candidates
    from matchtigs_tpu.ops import euler as euler_ops

    g_host = g.copy()
    cands = _CANDS[0]
    t0 = time.monotonic()
    acc = greedy_accept(g_host, cands, mult.copy())
    n = len(acc)
    if n:
        g_host.add_biedge_pairs(
            acc[:, 0].astype(np.int32),
            acc[:, 1].astype(np.int32),
            acc[:, 2],
            np.full(n, -1, dtype=np.int64),
            np.ones(n, dtype=bool),
            np.arange(1, n + 1, dtype=np.int64),
        )
    euler_ops.make_eulerian_with_breaking_edges(g_host, k, n)
    cycles = euler_ops.eulerian_bicycle_decomposition(g_host)
    euler_ops.break_cycles(g_host, cycles, k)
    host_rest_time = time.monotonic() - t0

    baseline_time = host_sssp_time + host_rest_time
    baseline_unitigs_per_s = n_unitigs / baseline_time
    vs_baseline = unitigs_per_s / baseline_unitigs_per_s
    print(
        f"host baseline: {baseline_time:.2f}s (sssp {host_sssp_time:.2f}s "
        f"extrapolated from {len(sample)} sources) -> "
        f"{baseline_unitigs_per_s:.0f} unitigs/s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "greedy_matchtigs_unitigs_per_s",
                "value": round(unitigs_per_s, 1),
                "unit": "unitigs/s",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
