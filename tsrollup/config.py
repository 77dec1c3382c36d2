"""Engine configuration.

Pinned defaults come from SURVEY.md §2.4 (detector numerics) and §2.8
(codec block sizing). Everything here is a plain dataclass so configs are
picklable into pandas-UDF closures without dragging Spark objects along.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: Retention tiers, finest → coarsest. Cascade order matters: 1h is built
#: from 1m partials, 1d from 1h partials (SURVEY.md §2.3).
TIERS = ("1m", "1h", "1d")

#: Spark date_trunc unit per tier.
TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}

#: Tier bucket width in microseconds (timestamps are µs, UTC).
TIER_US = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}

#: Tier width as a Spark INTERVAL literal (gap-fill spine generation).
TIER_INTERVAL = {"1m": "INTERVAL 1 MINUTE", "1h": "INTERVAL 1 HOUR", "1d": "INTERVAL 1 DAY"}

#: Which finer tier each tier cascades from (None = from raw).
CASCADE_FROM = {"1m": None, "1h": "1m", "1d": "1h"}

#: Default retention horizon per tier, in days (R1). None = keep forever.
TIER_RETENTION_DAYS = {"1m": 14, "1h": 90, "1d": None}

#: Per-SINK retention horizons (days) per tier; None = keep forever.
#: The Gorilla block store keeps a LONGER horizon than the columnar
#: rollup/scores at equal budget (blobs are ~8-20x smaller), so ranges
#: whose columnar partitions aged out stay servable through the cold-read
#: path (query.read_range_decoded).
SINK_RETENTION_DAYS = {
    "rollup": TIER_RETENTION_DAYS,
    "scores": dict(TIER_RETENTION_DAYS),
    "blocks": {"1m": 90, "1h": 365, "1d": None},
}


@dataclass(frozen=True)
class DetectorConfig:
    """Pinned detector numerics (SURVEY.md §2.4). These values are part of
    the parity contract between the Spark kernels and the NumPy oracle."""

    window: int = 60          # z-score trailing window W (min_periods=W)
    tau: float = 3.0          # |z| >= tau  =>  anomaly
    alpha: float = 0.3        # EWMA smoothing (adjust=False)
    eps: float = 1e-12        # EW variance floor for score stability
    value_col: str = "n_tok_mean"  # primary series; "cnt" is the secondary
    #: max buckets per detector shard (hot-source path, SURVEY.md §2.6);
    #: None = whole series per task. Must be a multiple of
    #: kernels.SCAN_CHUNK; output is byte-identical either way.
    shard_buckets: int | None = None


@dataclass(frozen=True)
class RollupConfig:
    tiers: tuple = TIERS
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    #: two-phase aggregation salt fan-out for skewed sources (K2);
    #: None disables salting (Catalyst partial agg only).
    salt_buckets: int | None = 8
    #: partition count for explicit range repartitions (ordered writes); the
    #: grouped-map kernels intentionally do NOT range-partition first (their
    #: required hash-clustering Exchange supersedes it — see detect.py).
    range_partitions: int = 32
    #: exactly-incremental derived phase: resume detectors from the
    #: per-(source, tier) grid-cut state checkpoint when the batch is a
    #: pure append (increment.py); byte-identical to full recompute.
    incremental: bool = True
    #: gap-fill interpolation method for value columns: "locf" | "linear".
    gapfill_method: str = "locf"
    #: codec block width = 1 day of buckets (SURVEY.md §2.8).
    block_interval: str = "1d"
    #: block storage layout: "decomposed" stores one integer-stream row
    #: per day-block (means re-derived by exact division; per-block
    #: encode-time verification with automatic per-metric XOR fallback,
    #: codec.py C4); "per_metric" always writes the round-2 XOR rows.
    block_layout: str = "decomposed"

    def __post_init__(self):
        # fail at construction, not minutes later inside a cluster stage
        if self.gapfill_method not in ("locf", "linear"):
            raise ValueError(
                f"unknown gapfill method {self.gapfill_method!r} (locf|linear)"
            )
        if self.block_layout not in ("decomposed", "per_metric"):
            raise ValueError(
                f"unknown block layout {self.block_layout!r} (decomposed|per_metric)"
            )
        unknown = [t for t in self.tiers if t not in TIER_TRUNC]
        if unknown:
            raise ValueError(f"unknown tiers {unknown}; known: {list(TIER_TRUNC)}")
