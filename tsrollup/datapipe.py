"""Training-data-pipeline operators beyond the rollup core: LSH-bucketed
approximate nearest neighbor and multimodal-column plumbing.

The SQL-expressible pipeline ops (exact dedup, MinHash+LSH near-dup,
quality scoring, token counting, fingerprinting, language-ID shape,
brute-force cosine top-k) live in driver_queries.py with DuckDB oracles.
The two here genuinely need NumPy kernels, so they get rows-only checks
from the driver and dedicated tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------------ ANN/LSH


def _planes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic random hyperplanes (seeded; same on driver & workers)."""
    return np.random.default_rng(20240101).standard_normal((n_planes, dim)).astype(np.float64)


def with_lsh_bucket(df: DataFrame, n_planes: int = 12, dim: int = 64, vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane (SimHash) LSH: bucket = sign-bit string of the
    vector's dot products with fixed planes. Vectorized pandas UDF — one
    matmul per Arrow batch, no per-row Python.

    Scale path: the bucket column becomes the shuffle/partition key, so
    candidate generation is a per-bucket local join instead of a full
    cross-join — at 10^9 vectors the cross-join is impossible and this
    is the standard production ANN sharding."""
    planes = _planes(n_planes, dim)

    @F.pandas_udf("string")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim) float32 -> float64 matmul
        bits = (m.astype(np.float64) @ planes.T) >= 0.0
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        codes = (bits @ weights).astype(np.int64)
        return pd.Series([format(c, "x") for c in codes])

    return df.withColumn("lsh_bucket", bucket_udf(F.col(vec_col)))


def ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    n_query: int = 3,
    k: int = 5,
    n_planes: int = 5,
) -> DataFrame:
    """ANN: candidates share an LSH bucket with the query; exact cosine
    re-rank within the bucket. Returns (q_id, vec_id, cos_sim, rnk)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    emb = with_lsh_bucket(emb, n_planes=n_planes, vec_col="v")
    q = emb.where(F.col("vec_id") < n_query).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "lsh_bucket"
    )
    dot = F.aggregate(F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    cand = q.join(emb, "lsh_bucket").where(F.col("vec_id") != F.col("q_id"))
    sims = cand.select(
        "q_id", "vec_id", F.round(dot / (norm(F.col("qv")) * norm(F.col("v"))), 6).alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return sims.select("q_id", "vec_id", "cos_sim", F.row_number().over(w).alias("rnk")).where(
        F.col("rnk") <= k
    )


# ----------------------------------------------- embedding near-dup (LSH)
#
# Scale path for "emit all pairs >= tau, dedup by keeper": candidates come
# from banded random-hyperplane LSH (a pair is a candidate iff it shares a
# bucket in ANY band), verified with exact cosine. At 10^9 vectors the
# all-pairs join is impossible; the band self-join shuffles each vector
# B times and joins within buckets — the standard production sharding.
# Both the Spark query and its DuckDB oracle twin compute the SAME banded
# algorithm (the planes are embedded as literals in the generated SQL), so
# the driver's value-hash verifies the semantics exactly; RECALL vs the
# brute-force baseline is measured separately (tests/test_datapipe.py).

#: banded-LSH defaults for the driver queries (500-vector fixture).
ND_BANDS = 4
ND_PLANES = 4
ND_DIM = 64
ND_TAU = 0.45


def neardup_planes(
    bands: int = ND_BANDS, planes: int = ND_PLANES, dim: int = ND_DIM
) -> np.ndarray:
    """(bands, planes, dim) hyperplanes, rounded to 4 decimals so the SQL
    literal and the Spark literal parse to the SAME float64."""
    rng = np.random.default_rng(20240202)
    return np.round(rng.standard_normal((bands, planes, dim)), 4)


def _bucket_expr(vec_col, band_planes: np.ndarray):
    """Spark bucket string for one band: per plane, the sign bit of the
    dot product rounded to 6 decimals (rounding pins the sign across
    engines; both sides fold the dot left-to-right)."""
    from pyspark.sql import functions as FF

    bits = []
    for plane in band_planes:
        p = FF.array(*[FF.lit(float(c)) for c in plane])
        dot = FF.aggregate(
            FF.zip_with(vec_col, p, lambda a, b: a * b),
            FF.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(FF.when(FF.round(dot, 6) >= 0, FF.lit("1")).otherwise(FF.lit("0")))
    return FF.concat(*bits)


def embedding_neardup_pairs(
    spark: SparkSession,
    sf_dir: str,
    tau: float = ND_TAU,
    planes: np.ndarray | None = None,
) -> DataFrame:
    """All (vec_a < vec_b) pairs sharing an LSH bucket in >=1 band with
    exact cosine >= tau. Returns (vec_a, vec_b, cos_sim rounded to 4)."""
    planes = neardup_planes() if planes is None else planes
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    banded = None
    for b in range(planes.shape[0]):
        part = e.select(
            "vec_id", "v", F.lit(b).alias("band"), _bucket_expr(F.col("v"), planes[b]).alias("bucket")
        )
        banded = part if banded is None else banded.unionByName(part)
    a = banded.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "band", "bucket"
    )
    b2 = banded.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "band", "bucket"
    )
    cand = (
        a.join(b2, ["band", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "va", "vb")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return (
        cand.withColumn("cos_sim", F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), 4))
        .where(F.col("cos_sim") >= tau)
        .select("vec_a", "vec_b", "cos_sim")
    )


def neardup_pairs_sql(tau: float = ND_TAU, planes: np.ndarray | None = None) -> str:
    """DuckDB twin of embedding_neardup_pairs: same bands, same planes (as
    literals), same rounded-sign buckets, same exact-cosine verify."""
    planes = neardup_planes() if planes is None else planes
    band_selects = []
    for b in range(planes.shape[0]):
        bits = []
        for plane in planes[b]:
            lit = "[" + ", ".join(repr(float(c)) for c in plane) + "]"
            bits.append(
                f"(CASE WHEN round(list_dot_product(e, {lit}), 6) >= 0 "
                f"THEN '1' ELSE '0' END)"
            )
        band_selects.append(
            f"SELECT vec_id, e, {b} AS band, ({' || '.join(bits)}) AS bucket FROM v"
        )
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    banded AS ({' UNION ALL '.join(band_selects)}),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cos_sim FROM (
      SELECT c.vec_a, c.vec_b,
             round(list_cosine_similarity(va.e, vb.e), 4) AS cos_sim
      FROM cand c JOIN v va ON va.vec_id = c.vec_a JOIN v vb ON vb.vec_id = c.vec_b
    ) WHERE cos_sim >= {tau!r}
    """


# ------------------------------------------------------------- multimodal


MM_FEATURE_SCHEMA = (
    "doc_id string, media_type string, n_bytes int, width int, height int, "
    "feature array<double>"
)


def multimodal_features(spark: SparkSession, sf_dir: str, feat_dim: int = 8) -> DataFrame:
    """Multimodal-column plumbing: opaque binary payloads + typed metadata,
    decoded/feature-extracted in Arrow-batched mapInPandas.

    The sandbox has no image/audio libraries, so the payloads are utf-8
    bytes of `documents.text` and `_decode_stub` produces deterministic
    fake features — but the Spark-side plumbing (binary column, metadata
    struct, batch iteration, declared output schema, partition-parallel
    execution) is exactly what a real decoder plugs into: swap
    `_decode_stub` for PIL/ffmpeg and nothing else changes."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.col("n_chars").cast("int").alias("n_chars"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )

    def extract(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            media_types = [m["media_type"] for m in pdf["meta"]]
            feats = [_decode(p, mt, feat_dim) for p, mt in zip(payloads, media_types)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": media_types,
                    "n_bytes": [len(p) for p in payloads],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "feature": [f[2] for f in feats],
                }
            )

    return d.mapInPandas(extract, schema=MM_FEATURE_SCHEMA)


#: media decoder registry: media_type -> decode(payload, feat_dim) ->
#: (width, height, feature). A real deploy registers PIL/ffmpeg-backed
#: decoders here (e.g. "image/jpeg", "audio/wav", "video/mp4" with frame
#: sampling); nothing else in the Spark plumbing changes.
_DECODERS: dict = {}


def register_decoder(media_type: str, fn) -> None:
    _DECODERS[media_type] = fn


def _decode(payload: bytes, media_type: str, feat_dim: int):
    """Dispatch on the typed metadata. Unregistered media types raise
    NotImplementedError (loudly, per task) instead of faking output."""
    fn = _DECODERS.get(media_type)
    if fn is None:
        raise NotImplementedError(
            f"no decoder registered for media_type={media_type!r}; "
            f"registered: {sorted(_DECODERS)}"
        )
    return fn(payload, feat_dim)


def _decode_text_stub(payload: bytes, feat_dim: int):
    """STUB decoder for text payloads (no PIL/ffmpeg in this container).
    Deterministic fake: 'dimensions' from the byte length, 'features' from
    a byte histogram — exercises the full Spark plumbing (binary column,
    Arrow batches, declared schema) with a real decoder's shape."""
    n = len(payload)
    width = n % 640
    height = (n * 7) % 480
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return width, height, np.zeros(feat_dim, dtype=np.float64)
    hist = np.bincount(arr % feat_dim, minlength=feat_dim).astype(np.float64)
    return width, height, hist / arr.size


register_decoder("text/plain", _decode_text_stub)


# ------------------------------------------------------- real decoders
# Two REAL media decoders needing no external libraries: uncompressed
# 24-bit BMP and 16-bit PCM WAV are public header-described formats a
# pure-NumPy parser fully covers. They prove the registry/dispatch path
# with genuine decode work (header validation, layout math, padded-row /
# chunk walking, sample statistics) — the same shape a PIL/ffmpeg-backed
# decoder drops into for compressed formats.


def _fit(feats: list[float], feat_dim: int) -> np.ndarray:
    out = np.zeros(feat_dim, dtype=np.float64)
    out[: min(len(feats), feat_dim)] = feats[:feat_dim]
    return out


def make_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up rows padded to 4 bytes, BGR order)."""
    import struct

    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += pixels[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def _decode_bmp(payload: bytes, feat_dim: int):
    """REAL decoder: parse the BMP headers, reassemble the pixel array
    (bottom-up, row padding, BGR), return per-channel means/stds +
    brightness/contrast features."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    dib_size, w, h, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    row = w * 3
    stride = row + ((-row) % 4)
    flipped = h > 0
    h = abs(h)
    if len(payload) < pix_off + stride * h:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(payload, dtype=np.uint8, offset=pix_off, count=stride * h)
    rows = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if flipped:
        rows = rows[::-1]
    bgr = rows.astype(np.float64)
    gray = bgr.mean(axis=2)
    feats = [
        float(bgr[..., 2].mean()), float(bgr[..., 1].mean()), float(bgr[..., 0].mean()),
        float(bgr[..., 2].std()), float(bgr[..., 1].std()), float(bgr[..., 0].std()),
        float(gray.mean()), float(gray.std()),
    ]
    return w, h, _fit(feats, feat_dim)


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode an int16 array as a mono 16-bit PCM RIFF/WAVE file."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def _decode_wav(payload: bytes, feat_dim: int):
    """REAL decoder: walk the RIFF chunk list, validate the PCM fmt chunk,
    parse the int16 samples, return rms / peak / zero-crossing-rate +
    coarse 4-band spectrum. width = sample count, height = sample rate
    (the 'dimensions' of an audio clip)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only mono 16-bit PCM WAV")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2").astype(np.float64)
        pos += 8 + size + (size % 2)  # RIFF chunks are 2-byte aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    n = samples.shape[0]
    if n == 0:
        return 0, int(rate), np.zeros(feat_dim, dtype=np.float64)
    zcr = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
    spec = np.abs(np.fft.rfft(samples / 32768.0))
    bands = [float(b.sum()) for b in np.array_split(spec, 4)] if spec.size else [0.0] * 4
    feats = [
        float(np.sqrt(np.mean(samples**2))), float(np.abs(samples).max()),
        float(samples.mean()), zcr, *bands,
    ]
    return n, int(rate), _fit(feats, feat_dim)


register_decoder("image/bmp", _decode_bmp)
register_decoder("audio/wav", _decode_wav)


def multimodal_features_mixed(
    spark: SparkSession, sf_dir: str, feat_dim: int = 8
) -> DataFrame:
    """Media-type DISPATCH on real decoders: documents become a 3-way mix
    of payloads by doc_id — text/plain (utf-8 bytes), image/bmp (a real
    encoded BMP whose pixels tile the text bytes), audio/wav (a real PCM
    wave derived from the text bytes). Stage 1 synthesizes the binary
    payload column (fixture adapter — the testdata ships no media blobs);
    stage 2 is the SAME Arrow-batched decode path as multimodal_features,
    now exercising three decoders incl. the two real parsers. Everything
    is deterministic, so the driver entry is stable run to run."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "text",
    )

    def synth(batches):
        for pdf in batches:
            rows = {"doc_id": [], "payload": [], "media_type": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                arr = np.frombuffer(raw, dtype=np.uint8)
                kind = int(doc_id) % 3
                if kind == 0 or arr.size == 0:
                    mt, payload = "text/plain", raw
                elif kind == 1:
                    w = 16
                    h = max(1, min(8, arr.size // (w * 3)))
                    px = np.resize(arr, (h, w, 3))
                    mt, payload = "image/bmp", make_bmp(px)
                else:
                    samples = (arr.astype(np.int32) - 128) * 256
                    mt, payload = "audio/wav", make_wav(samples.astype(np.int16))
                rows["doc_id"].append(doc_id)
                rows["payload"].append(payload)
                rows["media_type"].append(mt)
            yield pd.DataFrame(rows)

    payloads = d.mapInPandas(
        synth, schema="doc_id string, payload binary, media_type string"
    )

    def extract(batches):
        for pdf in batches:
            feats = [
                _decode(p, mt, feat_dim)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "feature": [f[2] for f in feats],
                }
            )

    return payloads.mapInPandas(extract, schema=MM_FEATURE_SCHEMA)
