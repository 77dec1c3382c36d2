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

#: Default Gorilla block span per tier, in DAYS. One-day blocks are the
#: default everywhere; LONG-LIVED deployments override per tier via
#: RollupConfig.block_span_days — coarse tiers have few buckets per day
#: (1h: 24, 1d: 1), so on a months-long source a one-day block means one
#: point per block (~4.4 B/pt of pure header) and e.g. (("1h", 16),
#: ("1d", 128)) amortizes the per-block fixed cost across the span
#: (measured in BENCH/BASELINE.md §block-spans). Spans must be whole-day
#: multiples so the day = to_date(block_start) disk partition, the
#: incremental cut comparison (span floors stay day-aligned), and the
#: minute-grid v4 timestamps all stay valid. Tradeoffs bounded by the
#: span: the incremental re-derive halo is <= span raw rows per source
#: (increment.py) and retention drops a block only once its WHOLE span
#: is past the horizon (storage.drop_expired_partitions).
BLOCK_SPAN_DAYS = {"1m": 1, "1h": 1, "1d": 1}

_DAY_US = 86_400_000_000


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
    #: legacy codec block-width knob (round-4; block spans are now the
    #: per-tier BLOCK_SPAN_DAYS map above — SURVEY.md §2.8).
    block_interval: str = "1d"
    #: block storage layout: "decomposed" stores one integer-stream row
    #: per span-block (means re-derived by exact division; per-block
    #: encode-time verification with automatic per-metric XOR fallback,
    #: codec.py C4); "per_metric" always writes the round-2 XOR rows.
    block_layout: str = "decomposed"
    #: per-tier block span overrides in whole DAYS, as hashable items —
    #: e.g. (("1h", 16), ("1d", 128)) for long-lived sources (see
    #: BLOCK_SPAN_DAYS above). Empty = one-day blocks for every tier.
    #: Picklable into the grouped-map kernels with the rest of the config.
    block_span_days: tuple = ()

    def span_us(self, tier: str) -> int:
        """Block span for a tier in µs (whole-day multiple)."""
        return int(dict(self.block_span_days).get(tier, 1)) * _DAY_US

    def span_map_us(self) -> dict:
        """{tier: span_us} for every configured tier (kernel closures)."""
        return {t: self.span_us(t) for t in self.tiers}

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
        for t, d in dict(self.block_span_days).items():
            if t not in TIER_TRUNC or int(d) < 1:
                raise ValueError(
                    f"bad block span {t!r}: {d!r} (known tiers, days >= 1)"
                )
