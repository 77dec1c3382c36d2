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
