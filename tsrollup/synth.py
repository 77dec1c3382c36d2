"""Deterministic synthetic sequence-table generator (FIXTURES.md §A).

Generates the engine's real input shape — (doc_id, tokens:array<int32>,
n_tok, source, event_ts) — with zipf-skewed sources, per-source Poisson
arrivals, and planted anomalies (spikes / level shift / gaps) emitted as an
`expected_anomalies` side table. Pure NumPy + pyarrow: no Spark needed to
build fixtures, and every byte is a function of (n_rows, n_sources, seed).

Determinism rules (FIXTURES.md): single rng stream, draw order fixed,
rows written sorted by (source, event_ts) into a directory of part
files (split points are deterministic functions of n_rows, so bytes are
still a pure function of the params); re-partitioning for tests happens
at read time, never at generation time.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
EPOCH_US = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z in µs


@dataclass(frozen=True)
class PlantedWindow:
    source: str
    start_us: int
    end_us: int
    kind: str  # 'spike' | 'shift' | 'gap'


def _sequence_arrow_schema() -> pa.schema:
    return pa.schema(
        [
            pa.field("doc_id", pa.string(), nullable=False),
            pa.field("tokens", pa.list_(pa.field("element", pa.int32(), nullable=False)), nullable=False),
            pa.field("n_tok", pa.int32(), nullable=False),
            pa.field("source", pa.string(), nullable=False),
            pa.field("event_ts", pa.timestamp("us", tz="UTC"), nullable=False),
        ]
    )


def synthesize(
    n_rows: int = 10_000,
    n_sources: int = 20,
    seed: int = 42,
    plant_anomalies: bool = True,
    rate_scale: float = 1.0,
) -> tuple[pa.Table, list[PlantedWindow]]:
    """Build the sequence table + planted-anomaly windows, fully in memory.

    rate_scale multiplies every source's arrival rate: 1.0 is the sparse
    unit-test profile (0.2–5 events/min, FIXTURES.md §A); benches use a
    dense profile (e.g. 100×) matching the production regime where 10^12
    sequences mean thousands of rows per source-minute, so per-bucket
    reduction — not per-bucket file overhead — dominates.

    Returns (arrow_table sorted by (source, event_ts), planted_windows).
    """
    rng = np.random.default_rng(seed)

    # (1) source assignment: zipf(a=1.5), clipped to [0, K)
    k = np.minimum(rng.zipf(1.5, n_rows) - 1, n_sources - 1).astype(np.int64)

    # (2) per-source arrival-rate multipliers in [0.2, 5) events/minute
    rate = rng.uniform(0.2, 5.0, n_sources) * rate_scale

    # (3) per-source Poisson arrivals: exponential inter-arrival gaps (µs),
    #     strictly increasing per source (gap >= 1µs). Drawn in source order.
    ts_us = np.empty(n_rows, dtype=np.int64)
    src_start_us = np.full(n_sources, -1, dtype=np.int64)
    src_end_us = np.full(n_sources, -1, dtype=np.int64)
    for s in range(n_sources):
        idx = np.flatnonzero(k == s)
        if idx.size == 0:
            continue
        scale_us = 60_000_000.0 / rate[s]
        gaps = np.maximum(rng.exponential(scale_us, idx.size).astype(np.int64), 1)
        t = EPOCH_US + np.cumsum(gaps)
        ts_us[idx] = t
        src_start_us[s] = t[0]
        src_end_us[s] = t[-1]

    # (4) base n_tok: lognormal(5.5, 0.6) clipped to [8, 4096]
    n_tok = np.clip(rng.lognormal(5.5, 0.6, n_rows), 8, 4096).astype(np.int64)

    # (5) planted anomalies on the most-frequent sources (deterministic
    #     role assignment: counts desc, source index asc as tie-break).
    planted: list[PlantedWindow] = []
    keep = np.ones(n_rows, dtype=bool)
    if plant_anomalies and n_sources >= 6:
        counts = np.bincount(k, minlength=n_sources)
        order = np.lexsort((np.arange(n_sources), -counts))
        spike_srcs, shift_src, gap_srcs = order[0:3], order[3], order[4:6]
        minute = 60_000_000
        for s in spike_srcs:
            w0 = src_start_us[s] + 60 * minute
            w1 = w0 + 10 * minute
            m = (k == s) & (ts_us >= w0) & (ts_us < w1)
            n_tok[m] = np.minimum(n_tok[m] * 4, 4 * 4096)
            planted.append(PlantedWindow(f"src-{s:03d}", int(w0), int(w1), "spike"))
        s = shift_src
        w0 = (src_start_us[s] + src_end_us[s]) // 2
        m = (k == s) & (ts_us >= w0)
        n_tok[m] = np.minimum(n_tok[m] * 2, 2 * 4096)
        planted.append(PlantedWindow(f"src-{s:03d}", int(w0), int(src_end_us[s]), "shift"))
        for s in gap_srcs:
            # plant the deletion mid-span so rows exist on BOTH sides of the
            # gap — otherwise it truncates the series and the gap-fill spine
            # (which ends at the source's max bucket) never sees it.
            span = src_end_us[s] - src_start_us[s]
            w0 = src_start_us[s] + span // 3
            w1 = w0 + min(60 * minute, span // 3)
            m = (k == s) & (ts_us >= w0) & (ts_us < w1)
            keep &= ~m
            planted.append(PlantedWindow(f"src-{s:03d}", int(w0), int(w1), "gap"))

    # (6) apply the gap deletions, then generate tokens for surviving rows
    #     only, in i order (fixed draw order). Token ids come from the float
    #     path (uniform * VOCAB): this box draws bounded ints at ~1.5M/s but
    #     float64 uniforms at ~150M/s — same determinism, 100x faster.
    idx_keep = np.flatnonzero(keep)
    n_tok = n_tok[idx_keep]
    k = k[idx_keep]
    ts_us = ts_us[idx_keep]
    total_tok = int(n_tok.sum())
    flat_tokens = np.empty(total_tok, dtype=np.int32)
    CHUNK = 64_000_000  # bound the float64 temp to ~512 MB
    for lo in range(0, total_tok, CHUNK):
        hi = min(lo + CHUNK, total_tok)
        flat_tokens[lo:hi] = (rng.random(hi - lo) * VOCAB).astype(np.int32)
    offsets = np.zeros(idx_keep.size + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])

    doc_id = ("doc-" + pd.Series(idx_keep).astype(str).str.zfill(12)).to_numpy(dtype=object)
    source = ("src-" + pd.Series(k).astype(str).str.zfill(3)).to_numpy(dtype=object)

    # (7) sort by (source, event_ts) — generation order stays i-based above.
    #     The token gather copies per-row slices into ONE preallocated
    #     buffer: this sandbox's VM materializes fresh anon memory at only
    #     ~8 MB/s on first touch, so the vectorized repeat+fancy-index
    #     gather (3 extra total_tok-sized temporaries) loses to a plain
    #     row loop that allocates nothing. pyarrow's list-take is slower
    #     still (element-walking).
    perm = np.lexsort((ts_us, k))
    lens_sorted = n_tok[perm]
    new_offsets = np.zeros(idx_keep.size + 1, dtype=np.int64)
    np.cumsum(lens_sorted, out=new_offsets[1:])
    flat_sorted = np.empty(total_tok, dtype=np.int32)
    starts = offsets[:-1]
    pos = 0
    for j in perm:
        ln = n_tok[j]
        st = starts[j]
        flat_sorted[pos : pos + ln] = flat_tokens[st : st + ln]
        pos += ln
    del flat_tokens
    # list<int32> offsets are 32-bit, so one monolithic array caps the
    # fixture at 2^31 flat tokens (an 8M-row dense fixture holds ~2.2e9).
    # Chunk rows so every chunk's token count fits, building each chunk
    # directly as list<int32> — same bytes on disk, no row-count ceiling.
    lst_type = pa.list_(pa.field("element", pa.int32(), nullable=False))
    n_kept = idx_keep.size
    chunks = []
    row_lo = 0
    lim = (1 << 31) - 8
    while row_lo < n_kept:
        row_hi = int(
            np.searchsorted(new_offsets, new_offsets[row_lo] + lim, side="right")
        ) - 1
        row_hi = min(max(row_hi, row_lo + 1), n_kept)
        off32 = (
            new_offsets[row_lo : row_hi + 1] - new_offsets[row_lo]
        ).astype(np.int32)
        vals = flat_sorted[new_offsets[row_lo] : new_offsets[row_hi]]
        arr = pa.ListArray.from_arrays(pa.array(off32), pa.array(vals))
        chunks.append(arr.cast(lst_type))
        row_lo = row_hi
    tok_sorted = pa.chunked_array(chunks, type=lst_type)

    table = pa.Table.from_arrays(
        [
            pa.array(doc_id[perm], type=pa.string()),
            tok_sorted,
            pa.array(n_tok[perm].astype(np.int32), type=pa.int32()),
            pa.array(source[perm], type=pa.string()),
            pa.array(ts_us[perm], type=pa.timestamp("us", tz="UTC")),
        ],
        schema=_sequence_arrow_schema(),
    )
    return table, planted


def planted_to_table(planted: list[PlantedWindow]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "source": [p.source for p in planted],
            "window_start": pa.array([p.start_us for p in planted], pa.timestamp("us", tz="UTC")),
            "window_end": pa.array([p.end_us for p in planted], pa.timestamp("us", tz="UTC")),
            "kind": [p.kind for p in planted],
        }
    )


def write_fixture(
    out_dir: str,
    n_rows: int = 10_000,
    n_sources: int = 20,
    seed: int = 42,
    plant_anomalies: bool = True,
    rate_scale: float = 1.0,
) -> str:
    """Write sequences.parquet + expected_anomalies.parquet under out_dir.

    Idempotent cache: if the fixture for these params already exists
    (marker file records the params), it is reused.
    """
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_FIXTURE")
    tag = f"n={n_rows} k={n_sources} seed={seed} anomalies={plant_anomalies} rs={rate_scale} v=4"
    seq_path = os.path.join(out_dir, "sequences.parquet")
    if os.path.exists(marker) and os.path.exists(seq_path):
        with open(marker) as f:
            if f.read().strip() == tag:
                return seq_path
    table, planted = synthesize(n_rows, n_sources, seed, plant_anomalies, rate_scale)
    # sequences.parquet is a DIRECTORY of part files, like any real table at
    # scale. A single multi-GB file caps the Spark scan at
    # size/maxPartitionBytes splits (measured: a 2.4 GB single-file fixture
    # gave the heaviest phase only ~19 input tasks, starving local[32] and
    # corrupting the 8-vs-32 scaling evidence). 64 parts → every core gets
    # scan work at both parallelism levels.
    if os.path.isfile(seq_path):
        os.remove(seq_path)  # migrate pre-v4 single-file fixtures
    shutil.rmtree(seq_path, ignore_errors=True)
    os.makedirs(seq_path)
    n_parts = min(64, max(1, n_rows // 4096))
    step = (table.num_rows + n_parts - 1) // n_parts
    for i in range(n_parts):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(
                part,
                os.path.join(seq_path, f"part-{i:05d}.parquet"),
                row_group_size=max(1024, step // 4),
            )
    pq.write_table(planted_to_table(planted), os.path.join(out_dir, "expected_anomalies.parquet"))
    with open(marker, "w") as f:
        f.write(tag)
    return seq_path
