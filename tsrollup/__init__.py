"""tsrollup — a PySpark-native time-series rollup / downsample / retention
engine with sliding-window z-score + EWMA anomaly detectors.

Built from scratch against the spec in BASELINE.json (the reference tree is
empty — see SURVEY.md §0). Capability target: the operator core of
time-series anomaly-detection toolkits (sliding-window z-score / EWMA
detectors, streaming residual statistics) re-expressed as partition-parallel
Spark DataFrame transforms over a table of pre-tokenized training sequences:

    doc_id: string, tokens: array<int32>, n_tok: int32, source: string

Key modules:
    schemas         explicit StructType constants (no inference in prod paths)
    config          RollupConfig: tiers, detector params, paths
    synth           deterministic synthetic fixture generator (FIXTURES.md §A)
    rollup          bucketize + (salted) aggregation + tier cascade
    gapfill         per-source bucket spine + LOCF / linear interpolation
    kernels         pinned NumPy/pandas detector kernels (shared w/ oracle)
    detect          Spark applyInPandas wrappers around kernels
    codec           Gorilla XOR + delta-of-delta compression (VLDB 2015)
    resume          per-unit lineage ledger; exact resume (anti-join)
    reference_impl  single-node pandas oracle (same kernel code objects)
    pipeline        rollup_build / score entry points
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep freed large allocations in the heap instead of returning them
    to the OS (glibc mmap's >128 KB chunks and unmaps them on free). The
    vectorized kernels churn multi-MB numpy temporaries; on hypervisors
    with lazy page provisioning, re-faulting those pages on every call is
    orders of magnitude slower than the arithmetic. Raising the mmap
    threshold and disabling trim makes steady-state allocations reuse
    already-faulted pages. Runs in every process that imports tsrollup —
    including Spark Python workers. No-op where glibc/mallopt is absent;
    disable with TSROLLUP_NO_MALLOPT=1."""
    import ctypes
    import os

    if os.environ.get("TSROLLUP_NO_MALLOPT"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD = 1 GB
        libc.mallopt(-1, -1)  # M_TRIM_THRESHOLD: never trim
    except Exception:
        pass


_tune_malloc()
