"""Datapipe operator tests: LSH-ANN determinism and bucket sanity,
multimodal plumbing invariants, flagship entry smoke."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsrollup.datapipe import ann_lsh_topk, multimodal_features, with_lsh_bucket

from .conftest import TESTDATA

SF = os.path.join(TESTDATA, "sf0.001")


def test_lsh_bucket_deterministic(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    b1 = with_lsh_bucket(e, n_planes=5, vec_col="v").select("vec_id", "lsh_bucket").toPandas()
    b2 = (
        with_lsh_bucket(e.repartition(7), n_planes=5, vec_col="v")
        .select("vec_id", "lsh_bucket")
        .toPandas()
    )
    b1 = b1.sort_values("vec_id").reset_index(drop=True)
    b2 = b2.sort_values("vec_id").reset_index(drop=True)
    assert (b1["lsh_bucket"] == b2["lsh_bucket"]).all()
    assert b1["lsh_bucket"].nunique() > 1, "all vectors in one bucket — planes broken"


def test_ann_lsh_vs_bruteforce(spark):
    """LSH candidates are a subset: every LSH hit's similarity is <= the
    brute-force best, and the per-query ranking is internally consistent."""
    from tsrollup.driver_queries import SPARK

    lsh = ann_lsh_topk(spark, SF).toPandas()
    assert len(lsh) > 0
    brute = SPARK["ann_cosine_topk"](spark, SF).toPandas()
    best_brute = brute.groupby("q_id")["cos_sim"].max()
    for q_id, grp in lsh.groupby("q_id"):
        grp = grp.sort_values("rnk")
        sims = grp["cos_sim"].to_numpy()
        assert (np.diff(sims) <= 1e-12).all(), "rnk must be sim-descending"
        if q_id in best_brute.index:
            assert sims[0] <= best_brute[q_id] + 1e-4


def test_multimodal_plumbing(spark):
    feats = multimodal_features(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "n_chars").toPandas()
    assert len(feats) == len(docs)
    merged = feats.merge(docs.astype({"doc_id": str}), on="doc_id")
    # ascii text: payload bytes == n_chars
    assert (merged["n_bytes"] == merged["n_chars"]).all()
    assert (merged["media_type"] == "text/plain").all()
    nonempty = merged[merged["n_bytes"] > 0]
    sums = np.array([np.asarray(f).sum() for f in nonempty["feature"]])
    assert np.allclose(sums, 1.0), "byte-histogram features must normalize to 1"
    # deterministic stub: width/height are functions of byte length
    assert (merged["width"] == merged["n_bytes"] % 640).all()


def test_bmp_decoder_roundtrip():
    """REAL decoder: known pixels through make_bmp -> _decode_bmp must
    give exact per-channel means (incl. bottom-up row order + padding)."""
    from tsrollup.datapipe import _decode_bmp, make_bmp

    px = np.zeros((3, 5, 3), dtype=np.uint8)  # w=5: row pad of 1 byte
    px[..., 0] = 10   # R
    px[..., 1] = 100  # G
    px[..., 2] = 200  # B
    px[0, 0] = (255, 0, 0)  # one red pixel, top-left: catches row flips
    w, h, f = _decode_bmp(make_bmp(px), 8)
    assert (w, h) == (5, 3)
    exp = px.astype(np.float64)
    assert f[0] == exp[..., 0].mean()  # R
    assert f[1] == exp[..., 1].mean()  # G
    assert f[2] == exp[..., 2].mean()  # B
    with pytest.raises(ValueError):
        _decode_bmp(b"JUNK" * 20, 8)
    with pytest.raises(ValueError):
        _decode_bmp(make_bmp(px)[:-4], 8)  # truncated pixel data


def test_wav_decoder_roundtrip():
    from tsrollup.datapipe import _decode_wav, make_wav

    t = np.arange(8000)
    samples = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    n, rate, f = _decode_wav(make_wav(samples, 8000), 8)
    assert (n, rate) == (8000, 8000)
    assert abs(f[0] - np.sqrt(np.mean(samples.astype(np.float64) ** 2))) < 1e-9
    assert f[1] == np.abs(samples.astype(np.float64)).max()
    # 440 Hz tone: zero-crossing rate ~ 2*440/8000
    assert abs(f[3] - 2 * 440 / 8000) < 0.01
    # energy concentrates in the lowest of the 4 spectral bands
    assert f[4] > 10 * max(f[5], f[6], f[7])
    with pytest.raises(ValueError):
        _decode_wav(b"RIFFxxxxJUNK", 8)


def test_decoders_on_committed_fixture_files(spark):
    """Real media FILES from disk through the full Spark plumbing: read
    the committed .bmp/.wav fixtures with binaryFile, dispatch through the
    registry in mapInPandas, and check format-exact facts."""
    import pandas as pd

    from tsrollup.datapipe import MM_FEATURE_SCHEMA, _decode

    data_dir = os.path.join(os.path.dirname(__file__), "data")
    files = spark.read.format("binaryFile").load(
        os.path.join(data_dir, "sample.*")
    ).select("path", "content")

    ext_mt = {".bmp": "image/bmp", ".wav": "audio/wav", ".jpg": "image/jpeg"}

    def extract(batches):
        for pdf in batches:
            rows = []
            for path, payload in zip(pdf["path"], pdf["content"]):
                mt = ext_mt[os.path.splitext(path)[1]]
                w, h, f = _decode(bytes(payload), mt, 8)
                rows.append((os.path.basename(path), mt, len(payload), w, h, f))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "width", "height", "feature"],
            )

    out = {r["doc_id"]: r for r in files.mapInPandas(extract, schema=MM_FEATURE_SCHEMA).collect()}
    bmp = out["sample.bmp"]
    assert (bmp["width"], bmp["height"]) == (12, 8)
    # gradient image: R mean = mean of x*20 over x=0..11 = 110
    assert abs(bmp["feature"][0] - 110.0) < 1e-9
    wav = out["sample.wav"]
    assert (wav["width"], wav["height"]) == (2000, 8000)
    assert abs(wav["feature"][3] - 2 * 440 / 8000) < 0.01  # tone zcr
    jpg = out["sample.jpg"]
    assert (jpg["width"], jpg["height"]) == (56, 40)
    # features computed from the frozen decoded pixels
    want = np.load(os.path.join(data_dir, "sample_jpg_pixels.npy")).astype(np.float64)
    assert abs(jpg["feature"][0] - want[..., 0].mean()) < 1e-9
    assert abs(jpg["feature"][6] - want.mean(axis=2).mean()) < 1e-9


def test_unregistered_media_type_raises():
    from tsrollup.datapipe import _decode

    with pytest.raises(NotImplementedError, match="video/mp4"):
        _decode(b"\x00", "video/mp4", 8)


def test_multimodal_mixed_dispatch(spark):
    """The mixed entry must exercise all FOUR decoders (incl. the real
    compressed image/jpeg path) and produce format-consistent dimensions
    per media type."""
    from tsrollup.datapipe import multimodal_features_mixed

    feats = multimodal_features_mixed(spark, SF).toPandas()
    kinds = set(feats["media_type"])
    assert kinds == {"text/plain", "image/bmp", "audio/wav", "image/jpeg"}
    bmp = feats[feats["media_type"] == "image/bmp"]
    assert (bmp["width"] == 16).all() and bmp["height"].between(1, 8).all()
    wav = feats[feats["media_type"] == "audio/wav"]
    assert (wav["height"] == 8000).all() and (wav["width"] > 0).all()
    jpg = feats[feats["media_type"] == "image/jpeg"]
    assert len(jpg) > 0
    assert (jpg["width"] == 16).all() and jpg["height"].between(1, 8).all()
    # deterministic: re-run equals first run
    again = multimodal_features_mixed(spark, SF).toPandas()
    a = feats.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.drop(columns="feature").equals(b.drop(columns="feature"))
    assert all(np.array_equal(x, y) for x, y in zip(a["feature"], b["feature"]))


def test_embedding_neardup_lsh_subset_of_brute(spark):
    """The banded-LSH near-dup pairs must be a SUBSET of the brute-force
    threshold pairs (exact-cosine verify means no false positives), with
    non-trivial recall on the fixture; the keeper map star-dedups them."""
    from tsrollup.datapipe import ND_TAU, embedding_neardup_pairs
    from tsrollup.driver_queries import SPARK

    lsh = embedding_neardup_pairs(spark, SF).toPandas()
    brute = SPARK["dd_embedding_neardup"](spark, SF).toPandas()
    lset = {(a, b) for a, b in zip(lsh["vec_a"], lsh["vec_b"])}
    bset = {(a, b) for a, b in zip(brute["vec_a"], brute["vec_b"])}
    assert lset, "LSH found no pairs on the fixture"
    assert lset <= bset, f"false positives: {lset - bset}"
    assert (lsh["cos_sim"] >= ND_TAU).all()
    # recall gate (round-5 directive): 12 bands x 4 planes must find at
    # least 90% of the true pairs at tau=0.45 (4x4 measured 55-64%)
    assert len(lset) * 10 >= len(bset) * 9, f"recall < 90%: {len(lset)}/{len(bset)}"

    keeper = SPARK["dd_embedding_keeper"](spark, SF).toPandas()
    k = dict(zip(keeper["vec_id"], keeper["keep_id"]))
    assert len(k) == spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert all(k[v] <= v for v in k), "keeper must be the min id of the star"
    for a, b in lset:
        assert k[b] <= a, "pair member must point at (or below) its min neighbor"


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "source", "bucket_start", "tier", "detector", "value", "score", "is_anomaly",
    }
    # every oracle has a query, and names line up
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)


# ------------------------------------------------------------- SimHash

def test_simhash_identical_and_edited_docs(spark):
    """Identical texts hash identically (hamming 0); a one-word edit moves
    only the bits that word's votes flipped (small, nonzero hamming on a
    long doc — far below half the bits)."""
    from tsrollup.datapipe import simhash_of

    base = " ".join(f"w{i % 37}tok" for i in range(200))
    light = base.replace("w5tok", "zzztok", 1)  # 1 of 200 occurrences
    heavy = " ".join(
        (w if int(w[1:-3]) % 3 else f"q{w[1:-3]}new") for w in base.split(" ")
    )  # ~1/3 of all occurrences rewritten
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, light), (3, heavy)], "doc_id long, text string"
    )
    fp = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
          for r in simhash_of(docs).collect()}
    assert fp[0] == fp[1]
    ham_light = sum(bin(a ^ b).count("1") for a, b in zip(fp[0], fp[2]))
    ham_heavy = sum(bin(a ^ b).count("1") for a, b in zip(fp[0], fp[3]))
    # one occurrence out of 200 shifts each bit's vote sum by at most 2 —
    # near-identical fingerprint; a 1/3 rewrite must move many bits but
    # stay well under the ~32 expected of two UNRELATED docs
    assert ham_light <= 2, ham_light
    assert 2 < ham_heavy < 32, ham_heavy


def test_simhash_banded_join_complete(spark):
    """The 4-band candidate join is COMPLETE for hamming <= 3: its result
    equals the brute-force all-pairs answer on the fixture (pigeonhole —
    a pair differing in <= 3 of 64 bits shares >= 1 exact 16-bit band)."""
    from tsrollup.datapipe import SIMHASH_HAMMING, simhash_fingerprints, simhash_neardup

    sf = os.path.join(TESTDATA, "sf0.001")
    banded = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup(spark, sf).collect()
    }
    fps = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
           for r in simhash_fingerprints(spark, sf).collect()}
    ids = sorted(fps)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = sum(bin(x ^ y).count("1") for x, y in zip(fps[a], fps[b]))
            if h <= SIMHASH_HAMMING:
                brute[(a, b)] = h
    assert banded == brute and brute, (len(banded), len(brute))


def test_ann_ivf_subset_of_probed_cells(spark):
    """IVF results only ever come from the query's probed cells, and the
    re-rank within those cells is exact: every returned neighbor's true
    cosine >= the best excluded candidate IN the probed cells."""
    from tsrollup.driver_queries import SPARK as DQ

    sf = os.path.join(TESTDATA, "sf0.001")
    rows = DQ["ann_ivf"](spark, sf).collect()
    assert len(rows) == 15  # 3 queries x top-5
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r["cos_sim"])
    for q, sims in by_q.items():
        assert sims == sorted(sims, reverse=True), (q, sims)


def test_ann_ivf_kernel_matches_driver_query(spark):
    """The matmul IVF kernel (datapipe.ann_ivf_topk_kernel — the at-scale
    assignment path) returns the same neighbor sets as the fold-based,
    oracle-twinned driver query on the fixture."""
    from tsrollup.datapipe import ann_ivf_topk_kernel
    from tsrollup.driver_queries import SPARK as DQ

    sf = os.path.join(TESTDATA, "sf0.001")
    kern = {(r["q_id"], r["vec_id"]): r["cos_sim"]
            for r in ann_ivf_topk_kernel(spark, sf).collect()}
    quer = {(r["q_id"], r["vec_id"]): r["cos_sim"]
            for r in DQ["ann_ivf"](spark, sf).collect()}
    assert kern == quer and kern


def test_ngram_decontaminate_planted(spark):
    """Planted contamination: a corpus doc that quotes a benchmark
    passage is flagged with the exact distinct-ngram overlap count; clean
    docs and sub-n-word docs are not flagged; min_hits filters
    single-collision noise."""
    from tsrollup.datapipe import ngram_decontaminate

    bench = spark.createDataFrame(
        [(1000, "the quick brown fox jumps over the lazy dog tonight"),
         (1001, "pack my box with five dozen liquor jugs")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # quotes an 8-word benchmark passage -> 8-5+1 = 4 distinct 5-grams
            (1, "he said the quick brown fox jumps over the lazy cat"),
            # one accidental 5-gram collision only -> filtered by min_hits=2
            (2, "pack my box with five red apples and some pears"),
            (3, "completely clean document with no overlap at all here"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_hits"], r["n_bench_docs"])
           for r in ngram_decontaminate(corpus, bench, "doc_id", "text", 5, 2).collect()}
    # doc 1: window "the quick ... lazy" = 9 shared words -> 5 overlapping
    # 5-grams? verify against a pure-python reference instead of guessing
    def grams(txt, n=5):
        w = txt.lower().split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()

    bset = grams("the quick brown fox jumps over the lazy dog tonight") | grams(
        "pack my box with five dozen liquor jugs")
    for did, txt in [(1, "he said the quick brown fox jumps over the lazy cat"),
                     (2, "pack my box with five red apples and some pears"),
                     (3, "completely clean document with no overlap at all here"),
                     (4, "too short")]:
        hits = grams(txt) & bset
        if len(hits) >= 2:
            assert out[did][0] == len(hits)
        else:
            assert did not in out
    assert 1 in out and out[1][1] == 1  # one benchmark doc hit


BLOOM_BENCH = [
    (1000, "the quick brown fox jumps over the lazy dog tonight"),
    (1001, "pack my box with five dozen liquor jugs"),
]
BLOOM_CORPUS = [
    (1, "he said the quick brown fox jumps over the lazy cat"),
    (2, "pack my box with five red apples and some pears"),
    (3, "completely clean document with no overlap at all here"),
    (4, "so short"),
    # clean doc whose 3-grams ("gamma delta epsilon", "epsilon zeta eta")
    # deterministically COLLIDE in the m=64/k=2 filter below — the pinned
    # pure-false-positive row
    (5, "alpha beta gamma delta epsilon zeta eta theta"),
]


def _grams(txt, n=3):
    w = txt.lower().split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


def test_bloom_decontaminate_exact_hits(spark):
    """Bloom prefilter + exact verify: no false NEGATIVES ever (every doc
    sharing >= 1 gram with the benchmark is flagged with its full exact
    overlap count), and n_candidates >= n_hits by construction."""
    from tsrollup.datapipe import bloom_decontaminate

    bench = spark.createDataFrame(BLOOM_BENCH, "doc_id long, text string")
    corpus = spark.createDataFrame(BLOOM_CORPUS, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_candidates"], r["n_hits"])
           for r in bloom_decontaminate(
               corpus, bench, "doc_id", "text", n=3, m_bits=1 << 20, k=3
           ).collect()}
    bset = set().union(*(_grams(t) for _, t in BLOOM_BENCH))
    for did, txt in BLOOM_CORPUS:
        true_hits = len(_grams(txt) & bset)
        if true_hits:
            cand, hits = out[did]
            assert hits == true_hits, f"doc {did}: {hits} != {true_hits}"
            assert cand >= hits
        else:
            # a tiny corpus in a 2^20-bit filter: FP flags would mean the
            # position plumbing is broken (deterministic, so stable)
            assert did not in out


def test_bloom_decontaminate_bitset_matches_positions(spark):
    """The JVM-side bitset membership test agrees with a Python bitset
    built from the SAME xxhash64 double-hashed positions — pinning
    element_at/getbit word and bit indexing. A deliberately tiny filter
    (m=64) forces false positives, which must appear as candidates with
    n_hits = 0, never as verified hits."""
    from pyspark.sql import functions as F
    from tsrollup.datapipe import _bloom_positions, bloom_decontaminate, word_ngrams_expr

    m, k = 64, 2
    bench = spark.createDataFrame(BLOOM_BENCH, "doc_id long, text string")
    corpus = spark.createDataFrame(BLOOM_CORPUS, "doc_id long, text string")

    def positions(df):
        g = df.select(F.explode(word_ngrams_expr(F.col("text"), 3)).alias("ngram"))
        rows = g.distinct().select(
            "ngram", F.array(*_bloom_positions(F.col("ngram"), m, k)).alias("pos")
        ).collect()
        return {r["ngram"]: list(r["pos"]) for r in rows}

    bpos, cpos = positions(bench), positions(corpus)
    bits = set(p for ps in bpos.values() for p in ps)
    expect_cand = {}  # doc -> set of grams passing the python bitset
    bset = set(bpos)
    for did, txt in BLOOM_CORPUS:
        passing = {g for g in _grams(txt) if all(p in bits for p in cpos[g])}
        if passing:
            expect_cand[did] = (len(passing), len(passing & bset))
    out = {r["doc_id"]: (r["n_candidates"], r["n_hits"])
           for r in bloom_decontaminate(
               corpus, bench, "doc_id", "text", n=3, m_bits=m, k=k
           ).collect()}
    assert out == expect_cand
    # the tiny filter must have produced at least one pure false positive
    assert any(c > h for c, h in out.values())


def test_bloom_decontaminate_rejects_bad_m():
    import pytest
    from tsrollup.datapipe import bloom_decontaminate

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_decontaminate(None, None, m_bits=100)


def test_connected_components_vs_union_find(spark):
    """Label propagation == classic union-find on random graphs, and the
    chain/star/cycle/singleton shapes behave; non-convergence raises."""
    import numpy as np
    import pytest
    from tsrollup.datapipe import connected_components

    def uf_components(edges):
        parent = {}
        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    rng = np.random.default_rng(51)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 120, (220, 2)) if a != b]
    edges += [(1000 + i, 1001 + i) for i in range(12)]  # a 13-node chain
    edges += [(2000, 2000 + i) for i in range(1, 8)]    # a star
    edges += [(3000, 3001), (3001, 3002), (3002, 3000)] # a cycle
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["component"]
           for r in connected_components(df, "a", "b").collect()}
    want = uf_components(edges)
    assert got == want
    # every chain/star/cycle member got its cluster min
    assert all(got[1000 + i] == 1000 for i in range(13))
    assert all(got[2000 + i] == 2000 for i in range(8))
    assert all(got[3000 + i] == 3000 for i in range(3))

    # a chain longer than max_iter must raise, not under-merge
    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(long_chain, "a", "b", max_iter=3)


def test_connected_components_star_matches_label_prop(spark):
    """Alternating large-star/small-star == min-label propagation ==
    union-find on random graphs; and it converges on a LONG PATH in few
    rounds where label propagation would need O(diameter) iterations."""
    import numpy as np
    from tsrollup.datapipe import connected_components, connected_components_star

    rng = np.random.default_rng(61)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 150, (260, 2)) if a != b]
    edges += [(5000 + i, 5001 + i) for i in range(9)]
    df = spark.createDataFrame(edges, "a long, b long")
    star = {r["node"]: r["component"]
            for r in connected_components_star(df, "a", "b").collect()}
    prop = {r["node"]: r["component"]
            for r in connected_components(df, "a", "b").collect()}
    assert star == prop and star

    # 400-node path: diameter 399 >> max_rounds, but alternating-star
    # needs only O(log n) rounds
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(400)], "a long, b long"
    )
    got = {r["node"]: r["component"]
           for r in connected_components_star(path, "a", "b", max_rounds=20).collect()}
    assert got == {i: 0 for i in range(401)}


def test_bigram_lm_vs_pure_python(spark):
    """bigram_lm_score == a pure-Python add-1/2-smoothed bigram model on a
    tiny corpus with repeated bigrams, a single-word doc (no bigrams —
    excluded), and doubled spaces (empty-string tokens count as words,
    identically on both sides)."""
    import math
    from collections import Counter

    from tsrollup.datapipe import bigram_lm_score

    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat",
        3: "one",
        4: "a  b a  b",  # double spaces -> empty-string tokens
        5: "zzz qqq zzz qqq zzz",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_word"])
        for r in bigram_lm_score(docs).collect()
    }

    words = {i: t.lower().split(" ") for i, t in texts.items()}
    bigrams = {i: list(zip(ws, ws[1:])) for i, ws in words.items()}
    bc = Counter(b for bs in bigrams.values() for b in bs)
    cc = Counter(b[0] for bs in bigrams.values() for b in bs)
    vocab = len({w for ws in words.values() for w in ws})
    exp = {}
    for i, bs in bigrams.items():
        if not bs:
            continue
        micro = sum(
            round(
                m * math.log2((2 * bc[b] + 1) / (2 * cc[b[0]] + vocab)) * 1e6
            )
            for b, m in Counter(bs).items()
        )
        exp[i] = (len(bs), round(-micro / 1e6 / len(bs), 4))
    assert 3 not in got and got == exp


def test_bigram_lm_flags_gibberish(spark):
    """A doc whose bigrams never repeat anywhere in the corpus scores
    strictly more bits-per-word than docs made of corpus-frequent
    bigrams — the filter actually separates fluent from gibberish."""
    from tsrollup.datapipe import bigram_lm_score

    common = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    docs = spark.createDataFrame(
        common + [(99, "xq zv wk jp qg vb nm tr lw ke")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bits_per_word"] for r in bigram_lm_score(docs).collect()}
    assert rows[99] > max(v for k, v in rows.items() if k != 99) + 1.0


def test_containment_is_directional(spark):
    """dd_containment semantics: a short doc pasted verbatim into a long
    one scores containment ~1.0 in the short->long direction but low the
    other way — the asymmetry symmetric Jaccard cannot express. Checked
    against a pure-python reference including the df<=50 stop-gram bound
    (inert here, n_docs < 50)."""
    from tsrollup.driver_queries import SPARK
    import tempfile, os

    short = "the unique quick zebra vaulted over nine lazy marmots today"
    long_doc = ("completely different opening prose first. " + short
                + " and then a very long unrelated tail " + "filler words " * 40)
    docs = [(1, short, "en", "s1", len(short)),
            (2, long_doc, "en", "s1", len(long_doc)),
            (3, "nothing in common with either of them at all", "en", "s1", 45)]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        rows = {(r["doc_a"], r["doc_b"]): r["containment"]
                for r in SPARK["dd_containment"](spark, td).collect()}

    def gramset(s):
        s = s.lower()
        return {s[i:i + 5] for i in range(len(s) - 4)}

    g = {i: gramset(t) for i, t, *_ in docs}
    c12 = len(g[1] & g[2]) / len(g[1])
    assert c12 >= 0.9  # short inside long
    assert rows[(1, 2)] == round(c12, 6)
    assert (2, 1) not in rows  # long is NOT contained in short
    assert not any(3 in p for p in rows)


def test_kmeans_fixed_point_vs_numpy(spark):
    """Fixed-point Lloyd == a pure-NumPy integer reference on the sf0.001
    embeddings: same quantization, integer distances, round(sum/count)
    centroid update, (dist, cell) tie-break. Also sanity: assignments
    use > 1 cell and round-2 total inertia <= round-1 (Lloyd descent)."""
    import numpy as np

    from tsrollup.datapipe import KM_K, KM_SCALE, kmeans_fixed_point

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in emb])
    def round_half_away(v):
        # Spark's round() and DuckDB's round() both round half AWAY from
        # zero; np.rint is half-to-even and diverges on exact .5 ties
        return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)

    X = round_half_away(
        np.array([r["embedding"] for r in emb], dtype=np.float64) * KM_SCALE
    )

    def assign(C, cells):
        # exact integer distances; ties -> smaller cell id (lexsort order)
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d, axis=1)  # argmin takes first index == min cell
        return cells[best], d[np.arange(len(X)), best]

    C0 = X[ids < KM_K]
    cells0 = ids[ids < KM_K]
    a1, _ = assign(C0, cells0)
    live = np.unique(a1)
    C1 = np.array(
        [round_half_away(X[a1 == c].sum(axis=0) / (a1 == c).sum()) for c in live]
    )
    a2, d2 = assign(C1, live)
    _, d1 = assign(C0, cells0)

    got = {r["vec_id"]: (r["cell"], r["dist"])
           for r in kmeans_fixed_point(spark, sf).collect()}
    exp = {int(i): (int(c), int(d)) for i, c, d in zip(ids, a2, d2)}
    assert got == exp
    assert len(set(c for c, _ in got.values())) > 1
    assert d2.sum() <= d1.sum()


def test_video_frame_sampling(spark):
    """TSVR demux + stride sampling: sampled frame features == direct BMP
    decode of the same frames; stride semantics exact (frames 0,2,4 of
    6); truncated containers raise instead of yielding partial frames."""
    import numpy as np
    import pytest

    from tsrollup.datapipe import (
        _decode_bmp,
        make_bmp,
        make_video,
        sample_video_frames,
        video_frame_features,
    )

    frames = [make_bmp(np.full((4, 8, 3), 10 * i, dtype=np.uint8)) for i in range(6)]
    vid = make_video(frames)
    got = sample_video_frames(vid, stride=2)
    assert [i for i, _ in got] == [0, 2, 4]
    for i, fb in got:
        assert fb == frames[i]
        w, h, feats = _decode_bmp(fb, 4)
        assert (w, h) == (8, 4) and feats[0] == 10.0 * i
    with pytest.raises(ValueError, match="truncated"):
        sample_video_frames(vid[:-3], stride=1)
    with pytest.raises(ValueError, match="not a TSVR"):
        sample_video_frames(b"nope", stride=1)

    df = video_frame_features(spark, "/root/testdata/sf0.001", stride=2, n_frames=6)
    pdf = df.toPandas()
    n_docs = pdf["doc_id"].nunique()
    assert sorted(pdf["frame_idx"].unique()) == [0, 2, 4]
    assert len(pdf) == 3 * n_docs and n_docs > 0
    assert (pdf["width"] == 8).all() and (pdf["height"] == 4).all()
    # determinism: second run identical
    pdf2 = video_frame_features(
        spark, "/root/testdata/sf0.001", stride=2, n_frames=6
    ).toPandas()
    a = pdf.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    b = pdf2.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_entropy_semantics(spark):
    """tx_entropy: uniform distinct words -> log2(n); single repeated
    word -> 0; matches a pure-python Shannon computation with the same
    micro-bit rounding."""
    import math
    import os
    import tempfile
    from collections import Counter

    from tsrollup.driver_queries import SPARK

    texts = {
        1: "a b c d",          # uniform over 4 -> exactly 2.0 bits
        2: "x x x x x",        # degenerate -> 0.0
        3: "a a b",            # 2/3,1/3
        4: "one",              # single word -> 0.0
    }
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in texts.items()],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        got = {r["doc_id"]: (r["n_words"], r["entropy_bits"])
               for r in SPARK["tx_entropy"](spark, td).collect()}

    for i, t in texts.items():
        c = Counter(t.split(" "))
        n = sum(c.values())
        micro = sum(round(m * math.log2(m / n) * 1e6) for m in c.values())
        assert got[i] == (n, round(-micro / 1e6 / n, 4))
    assert got[1][1] == 2.0 and got[2][1] == 0.0 and got[4][1] == 0.0


def test_novelty_semantics(spark):
    """tx_novelty: an exact duplicate pair has novelty 0 (every gram
    shared); a doc with no 5-gram in common with anything scores 10000;
    a half-quoted doc lands strictly between."""
    import os
    import tempfile

    from tsrollup.driver_queries import SPARK

    quoted = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        (1, quoted, "en", "s", len(quoted)),
        (2, quoted, "en", "s", len(quoted)),                  # exact dup of 1
        (3, "zq xv wk jm pf unique gibberish entirely", "en", "s", 40),
        (4, quoted + " BUT with a fresh tail found nowhere zzqq", "en", "s", 90),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        got = {r["doc_id"]: r["novelty_per10k"]
               for r in SPARK["tx_novelty"](spark, td).collect()}
    assert got[1] == 0 and got[2] == 0       # dup pair: nothing unique
    assert got[3] == 10000                   # fully novel
    assert 0 < got[4] < 10000                # quote + fresh tail


def test_semantic_dedup_recall_and_keeper(spark):
    """SemDeDup (datapipe.semantic_dedup) on the sf0.01 embeddings:
    (a) removal verdicts match an independent pure-python reference
    (brute pairs restricted to the engine's own probed cells,
    keep-the-outlier (dist, vec_id) order); (b) probe-bounded pair
    recall vs UNclustered brute force is high on the fixture — the
    multi-probe is what buys this; (c) every co-probed dup pair retains
    at least one keeper; (d) primary cell/dist equal kmeans_fixed_point."""
    import numpy as np

    from tsrollup.datapipe import (
        SEM_EPS,
        SEM_NPROBE,
        _kmeans_round2_dists,
        kmeans_fixed_point,
        semantic_dedup,
    )

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in emb])
    X = np.array([r["embedding"] for r in emb], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sim = np.round(Xn @ Xn.T, 4)
    idx = {int(v): i for i, v in enumerate(ids)}

    d2 = _kmeans_round2_dists(spark, sf).toPandas()
    d2 = d2.sort_values(["vec_id", "dist", "cell"], kind="mergesort")
    probes: dict[int, list] = {}
    primary: dict[int, tuple] = {}
    for vid, g in d2.groupby("vec_id"):
        top = list(g[["cell", "dist"]].itertuples(index=False, name=None))
        probes[int(vid)] = [c for c, _ in top[:SEM_NPROBE]]
        primary[int(vid)] = top[0]

    out = semantic_dedup(spark, sf).collect()
    got = {r["vec_id"]: r["keep"] for r in out}

    # (d) primary assignment passes through identical to kmeans
    km = {r["vec_id"]: (r["cell"], r["dist"])
          for r in kmeans_fixed_point(spark, sf).collect()}
    assert {r["vec_id"]: (r["cell"], r["dist"]) for r in out} == km == primary

    # (a) reference verdicts over the engine's own probes
    ref = {}
    for v in map(int, ids):
        dist_v = primary[v][1]
        removed = False
        for u in map(int, ids):
            if u == v or not set(probes[v]) & set(probes[u]):
                continue
            if sim[idx[v], idx[u]] < SEM_EPS:
                continue
            du = primary[u][1]
            if du > dist_v or (du == dist_v and u > v):
                removed = True
                break
        ref[v] = not removed
    assert got == ref

    # (b) recall of probe-bounded pairs vs unclustered brute force
    brute = {
        (int(a), int(b))
        for i, a in enumerate(ids) for j, b in enumerate(ids)
        if a < b and sim[i, j] >= SEM_EPS
    }
    probed = {(a, b) for (a, b) in brute if set(probes[a]) & set(probes[b])}
    assert brute, "fixture has no semantic-dup pairs — test is vacuous"
    assert len(probed) * 2 >= len(brute), (
        f"probe-bounded recall collapsed: {len(probed)}/{len(brute)}"
    )

    # (c) at least one keeper survives per co-probed dup pair
    for a, b in probed:
        assert got[a] or got[b], f"pair ({a},{b}) fully removed"
    assert sum(1 for k in got.values() if not k) > 0, "no removals — vacuous"


def test_overlap_matrix_directional(spark):
    """tx_overlap_matrix: a small source fully quoted inside a large one
    shows small→large containment 10000 while the reverse stays well
    below; disjoint sources emit no pair row; counts match a pure-python
    brute force over distinct 5-gram sets."""
    import os
    import tempfile

    from tsrollup.driver_queries import SPARK

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " plus a much longer tail of entirely different prose " \
        "that keeps going with many extra grams beyond the quoted part"
    other = "zz qq ww unrelated content xx yy vv nothing shared here kk"
    docs = [
        (1, small, "en", "small", len(small)),
        (2, big, "en", "big", len(big)),
        (3, other, "en", "lone", len(other)),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        rows = SPARK["tx_overlap_matrix"](spark, td).collect()
    got = {(r["src_a"], r["src_b"]): (r["n_shared"], r["n_a"], r["contain_per10k"])
           for r in rows}

    def gset(text):
        t = text.lower()
        return {t[i:i + 5] for i in range(len(t) - 4)}

    gs = {"small": gset(small), "big": gset(big), "lone": gset(other)}
    for a in gs:
        for b in gs:
            if a == b:
                continue
            shared = len(gs[a] & gs[b])
            if shared == 0:
                assert (a, b) not in got
            else:
                n_shared, n_a, per10k = got[(a, b)]
                assert n_shared == shared and n_a == len(gs[a])
                assert per10k == (10000 * shared) // len(gs[a])
    assert got[("small", "big")][2] == 10000          # fully contained
    assert got[("big", "small")][2] < 5000            # reverse is partial
    assert ("lone", "small") not in got               # disjoint: no row


def test_cdc_chunking_properties(spark):
    """CDC chunking: chunks must PARTITION each doc (token totals
    conserved), identical docs must dedupe fully, and a copy shifted to
    a different offset must still share most chunks (the shift-immunity
    fixed-size blocking lacks)."""
    from tsrollup.datapipe import cdc_chunk_stats

    rng = np.random.default_rng(3)
    a = rng.integers(0, 50000, 400, dtype=np.int32).tolist()
    rows = [
        ("d1", a, len(a), "twin"),
        ("d2", list(a), len(a), "twin"),              # identical copy
        ("d3", a, len(a), "shift"),
        ("d4", [49999, 7, 13] + a, len(a) + 3, "shift"),  # offset copy
        ("d5", [12345], 1, "tiny"),                    # below window size
    ]
    seq = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    # small mask so short fixtures get interior boundaries
    out = {
        r["source"]: r.asDict()
        for r in cdc_chunk_stats(seq, window=2, mask=4).collect()
    }
    # partition property: chunk tokens sum to the input token counts
    assert out["twin"]["total_tokens"] == 2 * len(a)
    assert out["shift"]["total_tokens"] == 2 * len(a) + 3
    assert out["tiny"]["total_tokens"] == 1 and out["tiny"]["n_chunks"] == 1
    # identical docs: every chunk occurs twice -> unique is exactly half
    assert out["twin"]["unique_tokens"] * 2 == out["twin"]["total_tokens"]
    assert out["twin"]["dedup_per10k"] == 5000
    # offset copy: boundaries resync after the insertion, most chunks dedupe
    assert out["shift"]["unique_tokens"] < out["shift"]["total_tokens"]
    assert out["shift"]["dedup_per10k"] > 3000, (
        "shifted copy must still dedupe most chunks (CDC shift immunity); "
        f"got {out['shift']}"
    )
    with pytest.raises(ValueError, match="mask"):
        cdc_chunk_stats(seq, window=2, mask=1)


def test_snm_finds_adjacent_neardups_and_documents_its_miss(spark, tmp_path):
    """Sorted-neighborhood dedup: edited copies sharing a prefix sort
    adjacent and are found; a near-dup pair whose sort keys land far
    apart is the family's documented miss (banded LSH covers it)."""
    import pandas as pd

    from tsrollup.driver_queries import SPARK

    base = "the quick brown fox jumps over the lazy dog " * 5
    docs = [
        # shared prefix, one edit -> adjacent in sort order
        (1, "alpha " + base + "tail one", "en", "s0"),
        (2, "alpha " + base + "tail two", "en", "s0"),
        # same content but WILDLY different prefix: far apart in sort order
        (3, "zzz " + base, "en", "s0"),
        (4, "aaa " + base, "en", "s0"),
    ] + [
        (10 + i, f"filler document number {i} with its own words {i*7}", "en", "s0")
        for i in range(30)
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/documents.parquet", index=False)

    out = SPARK["dd_snm"](spark, sf).toPandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in pairs or (2, 1) in pairs, f"adjacent near-dup missed: {out}"
    assert not ((3, 4) in pairs or (4, 3) in pairs), (
        "docs 3/4 sort far apart — SNM by design cannot pair them "
        "(if this starts passing the window grew; update the docstring)"
    )
    assert (out["jacc"] >= 0.4).all() and (out["rank_dist"].between(1, 4)).all()


def test_image_phash_known_values():
    """Hand-checkable aHash: a flat image has NO bits set (nothing exceeds
    the mean); a half-bright image sets exactly the bright sample cells;
    bit order is s = i*8 + j (row-major)."""
    from tsrollup.datapipe import image_phash

    flat = np.full((8, 8, 3), 7, dtype=np.uint8)
    assert image_phash(flat) == 0

    half = np.zeros((8, 8, 3), dtype=np.uint8)
    half[:, 4:] = 255  # right half bright: columns 4..7 of every row
    expect = 0
    for i in range(8):
        for j in range(4, 8):
            expect |= 1 << (i * 8 + j)
    expect = expect - (1 << 64) if expect >= (1 << 63) else expect
    assert image_phash(half) == expect

    # non-square input exercises the nearest-neighbor index mapping
    tall = np.zeros((5, 16, 3), dtype=np.uint8)
    tall[0, :] = 200  # only source row 0 is bright -> samples i with (i*5)//8 == 0
    ph = image_phash(tall)
    bright_rows = {i for i in range(8) if (i * 5) // 8 == 0}
    for i in range(8):
        for j in range(8):
            assert bool((ph >> (i * 8 + j)) & 1) == (i in bright_rows)


def test_image_phash_neardup_vs_bruteforce(spark):
    """The banded pairs equal the BRUTE-FORCE all-pairs hamming<=3 set at
    sf0.001 — the pigeonhole completeness argument checked end to end on
    real data (and the hamming values match popcount exactly)."""
    from tsrollup.datapipe import image_phash_neardup

    pairs = image_phash_neardup(spark, SF, ham=3)
    # recompute hashes locally through the same public pieces
    from tsrollup.datapipe import bmp_pixels, image_phash, make_bmp

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .collect()
    )
    local = {}
    for r in docs:
        raw = r["text"].encode("utf-8")
        if not raw:
            continue
        arr = np.frombuffer(raw, dtype=np.uint8)
        hgt = max(1, min(8, arr.size // 48))
        local[r["doc_id"]] = image_phash(bmp_pixels(make_bmp(np.resize(arr, (hgt, 16, 3)))))
    ids = sorted(local)
    want = {}
    for ii, a in enumerate(ids):
        for b in ids[ii + 1:]:
            ham = bin((local[a] ^ local[b]) & ((1 << 64) - 1)).count("1")
            if ham <= 3:
                want[(a, b)] = ham
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    assert got == want
    assert len(want) > 0, "fixture must contain at least one near-dup image"


def test_image_phash_neardup_ham_contract():
    from tsrollup.datapipe import image_phash_neardup

    with pytest.raises(ValueError, match="ham"):
        image_phash_neardup(None, None, ham=4)


def test_audio_fingerprint_known_shapes():
    """Hand-checkable energy-delta bits: constant amplitude -> no rises
    -> 0; strictly growing frame energies -> all 64 bits set."""
    from tsrollup.datapipe import audio_fingerprint

    const = np.full(6500, 1000, dtype=np.int16)
    assert audio_fingerprint(const) == 0
    ramp = np.arange(6500, dtype=np.int16)  # |s| grows every frame
    ph = audio_fingerprint(ramp)
    assert ph == (((1 << 64) - 1) - (1 << 64))  # all 64 bits, signed -1
    # encode -> parse identity feeds the same fingerprint
    from tsrollup.datapipe import make_wav, wav_samples

    got, rate = wav_samples(make_wav(ramp, 8000))
    assert rate == 8000 and np.array_equal(got, ramp)
    assert audio_fingerprint(got) == ph


def test_audio_fp_neardup_planted(spark, tmp_path):
    """A one-character edit late in a long text perturbs ONE frame's
    energies -> at most 3 delta bits flip -> the banded join must surface
    the pair with the exact brute-force hamming; unrelated docs don't
    pair."""
    from tsrollup.datapipe import audio_fp_neardup

    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog " * 20
    edited = base[:-10] + "cat" + base[-7:]
    other = "completely different content with other words here " * 18
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [base, edited, other],
         "source": ["s"] * 3, "n_chars": [len(base), len(edited), len(other)]}
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in audio_fp_neardup(spark, str(tmp_path), ham=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert not any(3 in p for p in pairs)


def test_dd_fuzzy_planted_typo_pair(spark, tmp_path):
    """Blocked edit-distance dedup: a planted typo pair (same first token,
    2 edits inside the 24-char key) is found with the exact distance;
    docs whose first tokens differ are never candidates (blocking is the
    declared semantics, not an approximation bug)."""
    import pandas as pd
    from tsrollup.driver_queries import SPARK

    docs = [
        (1, "alpha quick brown fox jumps", "en", "s0"),
        (2, "alpha quikc brown fox jumps", "en", "s0"),   # transposition = 2 edits
        (3, "beta quick brown fox jumps", "en", "s0"),    # other block
        (4, "alpha totally different words here", "en", "s0"),  # same block, far
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    sf = str(tmp_path)
    pdf.to_parquet(f"{sf}/documents.parquet", index=False)

    out = SPARK["dd_fuzzy"](spark, sf).toPandas()
    got = {(r.doc_a, r.doc_b): r.dist for r in out.itertuples()}
    assert got.get((1, 2)) == 2, out
    assert all(3 not in p for p in got), "cross-block pair leaked"
    assert (1, 4) not in got and (2, 4) not in got, "distance gate failed"


def test_image_resize_exact_and_guards():
    """Nearest = pure index map (byte-exact vs a hand loop); box = exact
    integer mean on divisible factors and a loud fence otherwise."""
    import numpy as np
    import pytest

    from tsrollup.datapipe import image_resize

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    out = image_resize(img, 3, 5, "nearest")
    ref = np.array(
        [[img[(i * 6) // 3, (j * 10) // 5] for j in range(5)] for i in range(3)]
    )
    assert (out == ref).all()

    box = image_resize(img, 3, 5, "box")
    ref_box = np.array(
        [
            [
                img[2 * i : 2 * i + 2, 2 * j : 2 * j + 2]
                .reshape(-1, 3)
                .astype(np.int64)
                .sum(0)
                // 4
                for j in range(5)
            ]
            for i in range(3)
        ],
        dtype=np.uint8,
    )
    assert (box == ref_box).all()

    with pytest.raises(NotImplementedError):
        image_resize(img, 4, 5, "box")
    with pytest.raises(ValueError):
        image_resize(img, 0, 5)
    with pytest.raises(ValueError):
        image_resize(img, 3, 5, "bicubic")


def test_multimodal_thumbnails_roundtrip(spark):
    """The thumbnail pass is a pure function of the fixture: thumbs decode
    back to exactly the nearest-resized pixels of the source BMP."""
    import numpy as np

    from tsrollup.datapipe import (
        bmp_pixels, image_resize, make_bmp, multimodal_thumbnails,
    )
    from .conftest import TESTDATA

    sf = f"{TESTDATA}/sf0.001"
    out = multimodal_thumbnails(spark, sf).collect()
    assert len(out) > 0
    docs = {
        str(r["doc_id"]): r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    for r in out[:10]:
        raw = docs[r["doc_id"]].encode("utf-8")
        arr = np.frombuffer(raw, dtype=np.uint8)
        w = 16
        h = max(1, min(8, arr.size // (w * 3)))
        px = np.resize(arr, (h, w, 3))
        expect = image_resize(bmp_pixels(make_bmp(px)), 4, 8)
        got = bmp_pixels(bytes(r["thumb"]))
        assert (got == expect).all()
        assert (r["width"], r["height"]) == (w, h)


def _np_pq(emb, m=4, k=8, subdim=16, scale=1_000_000):
    """Pure-numpy reference of datapipe's fixed-point PQ training:
    per-subspace 2-round Lloyd, seeds vec_id < k, ties to lower cell,
    centroid update = round(mean) on exact integer sums."""
    import numpy as np

    fp = np.round(emb * scale).astype(np.int64)      # (n, 64)
    codes = np.empty((fp.shape[0], m), dtype=np.int64)
    cents = []
    for s in range(m):
        X = fp[:, s * subdim:(s + 1) * subdim]
        C = X[:k].copy()
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)   # (n, k)
        a1 = d.argmin(1)                                     # ties -> lowest
        C1 = np.empty_like(C)
        alive = np.zeros(k, dtype=bool)
        for c in range(k):
            mem = X[a1 == c]
            if len(mem):
                C1[c] = np.round(mem.sum(0) / len(mem))
                alive[c] = True
        # engine semantics: an emptied cell has no round-2 centroid row
        # at all — it can never win the round-2 argmin
        d2 = ((X[:, None, :] - C1[None, :, :]) ** 2).sum(2).astype(np.float64)
        d2[:, ~alive] = np.inf
        codes[:, s] = d2.argmin(1)
        cents.append(C1)
    return codes, cents


def test_pq_codes_match_numpy_reference(spark):
    import numpy as np

    from tsrollup.datapipe import pq_codes
    from .conftest import TESTDATA

    sf = f"{TESTDATA}/sf0.001"
    emb = np.array(
        [r["embedding"] for r in
         spark.read.parquet(f"{sf}/embeddings.parquet")
         .orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    ref_codes, _ = _np_pq(emb)
    got = pq_codes(spark, sf).collect()
    got_map = {(r["vec_id"], r["sub"]): r["code"] for r in got}
    n = emb.shape[0]
    assert len(got) == n * 4
    for v in range(n):
        for s in range(4):
            assert got_map[(v, s)] == ref_codes[v, s], (v, s)


def test_pq_adc_recall_vs_exact(spark):
    """ADC top-20 must substantially overlap the EXACT fixed-point L2
    top-20 — with M=4 x K=8 codes (64x compression) on 500 vectors the
    measured recall floor is asserted; ranking and distances themselves
    are exact integers (value-twinned by the oracle)."""
    import numpy as np

    from tsrollup.datapipe import pq_adc_topk
    from .conftest import TESTDATA

    sf = f"{TESTDATA}/sf0.001"
    rows = spark.read.parquet(f"{sf}/embeddings.parquet").orderBy("vec_id").collect()
    emb = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    fp = np.round(emb * 1_000_000).astype(np.int64)
    q = fp[ids == 0][0]
    exact = ((fp - q) ** 2).sum(1)
    order = np.lexsort((ids, exact))
    exact_top = [int(ids[i]) for i in order if ids[i] != 0][:20]

    got = pq_adc_topk(spark, sf, query_vec_id=0, topk=20).collect()
    got_ids = [r["vec_id"] for r in sorted(got, key=lambda r: r["rnk"])]
    recall = len(set(got_ids) & set(exact_top)) / 20
    assert recall >= 0.25, (recall, got_ids, exact_top)


def test_audio_resample_linear_exact():
    """Exact-integer linear resample: pure-python reference parity,
    half-rate == even-index decimation, same-rate == identity, upsample
    interpolates at floor-rounded midpoints, contract errors."""
    import pytest as _pytest

    from tsrollup.datapipe import audio_resample_linear

    rng = np.random.default_rng(31)
    s = rng.integers(-32768, 32767, size=101).astype(np.int16)

    def ref(s, ri, ro):
        n = len(s)
        out = []
        for i in range(max(1, n * ro // ri)):
            num = i * ri
            k = min(num // ro, n - 1)
            frac = num - k * ro
            k1 = min(k + 1, n - 1)
            out.append(int(s[k]) + ((int(s[k1]) - int(s[k])) * frac) // ro)
        return np.array(out, dtype=np.int16)

    for ri, ro in ((8000, 4000), (8000, 3000), (4000, 8000), (8000, 8000),
                   (44100, 8000)):
        got = audio_resample_linear(s, ri, ro)
        exp = ref(s, ri, ro)
        assert got.dtype == np.int16 and np.array_equal(got, exp), (ri, ro)

    assert np.array_equal(audio_resample_linear(s, 8000, 4000), s[::2][:50])
    assert np.array_equal(audio_resample_linear(s, 8000, 8000), s)
    up = audio_resample_linear(np.array([0, 100], dtype=np.int16), 1, 2)
    assert up.tolist() == [0, 50, 100, 100]  # midpoint + endpoint clamp
    assert audio_resample_linear(np.array([], dtype=np.int16), 8, 4).size == 0
    with _pytest.raises(ValueError, match="rates must be positive"):
        audio_resample_linear(s, 0, 4000)


def test_multimodal_audio_resample_pass(spark):
    """The Spark pass emits one row per audio doc (doc_id % 4 == 2),
    re-encoded payloads re-parse to exactly the kernel's output at the
    new rate, and the whole pass is deterministic."""
    from tsrollup.datapipe import (
        audio_resample_linear,
        multimodal_audio_resample,
        wav_samples,
    )

    sf = os.path.join(TESTDATA, "sf0.001")
    out = multimodal_audio_resample(spark, sf, rate_out=4000).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    expect_ids = {
        str(r["doc_id"]) for r in docs
        if int(r["doc_id"]) % 4 == 2 and len(r["text"].encode()) > 0
    }
    assert {r["doc_id"] for r in out} == expect_ids and out

    by_id = {r["doc_id"]: r for r in out}
    for r in docs:
        did = str(r["doc_id"])
        if did not in by_id:
            continue
        raw = np.frombuffer(r["text"].encode(), dtype=np.uint8)
        samples = ((raw.astype(np.int32) - 128) * 256).astype(np.int16)
        exp = audio_resample_linear(samples, 8000, 4000)
        got_samples, got_rate = wav_samples(bytes(by_id[did]["resampled"]))
        assert got_rate == 4000
        assert np.array_equal(got_samples, exp), did
        assert by_id[did]["n_in"] == len(samples)
        assert by_id[did]["n_out"] == len(exp)

    again = multimodal_audio_resample(spark, sf, rate_out=4000).collect()
    assert {(r["doc_id"], bytes(r["resampled"])) for r in again} == {
        (r["doc_id"], bytes(r["resampled"])) for r in out
    }


def test_video_scene_cuts_planted_boundaries(spark):
    """Scene boundaries (every scene_len frames) are flagged as cuts,
    within-scene transitions are not, and diffs are exact integers."""
    from tsrollup.datapipe import video_scene_cuts

    sf = os.path.join(TESTDATA, "sf0.001")
    out = video_scene_cuts(spark, sf, scene_len=3, n_frames=6).collect()
    assert out
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = r
    for doc_id, rows in by_doc.items():
        assert sorted(rows) == [1, 2, 3, 4, 5]
        for i, r in rows.items():
            if i % 3 == 0:  # scene boundary (frame 3 starts scene 2)
                # a constant-byte doc rolls to itself: boundary diff can
                # legitimately be 0 only if the frame bytes are uniform
                if r["diff_sum"] == 0:
                    continue
                assert r["is_cut"], (doc_id, i)
            else:  # within a scene frames are identical by construction
                assert r["diff_sum"] == 0 and not r["is_cut"], (doc_id, i)
    # at least half the docs show a genuine cut at frame 3
    cut3 = sum(1 for rows in by_doc.values() if rows[3]["is_cut"])
    assert cut3 >= len(by_doc) // 2


def test_word_ngram_kernel_matches_expr(spark):
    """Round-6 focused pin: the mapInPandas word-n-gram kernel (the
    bloom_decontaminate corpus path) emits EXACTLY the rows
    explode(word_ngrams_expr(text, n)) emits — including multi-space
    splits (empty words), short/empty docs, repeated grams (first-
    occurrence dedup), and non-ASCII code points. lower+split happen in
    Spark on BOTH paths, so the kernel's ' '.join is the only Python
    step under test."""
    from tsrollup.datapipe import _word_ngram_kernel, word_ngrams_expr

    texts = [
        "a b c d e",
        "a  b c",          # double space -> empty word token
        "x y",              # shorter than n
        "",                 # empty doc
        "a b c a b c a b",  # repeated grams, dedup to first occurrence
        "İ stanbul ı I i Straße é café naïve",
        "tab\tnot a space separator",
        " leading and trailing ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for n in (2, 3):
        expr_side = (
            df.select(
                F.col("doc_id").alias("c_id"),
                F.explode(word_ngrams_expr(F.col("text"), n)).alias("ngram"),
            )
            .toPandas()
            .sort_values(["c_id", "ngram"])
            .reset_index(drop=True)
        )
        kern_side = (
            df.select(
                F.col("doc_id").alias("c_id"),
                F.split(F.lower("text"), " ").alias("ws"),
            )
            .mapInPandas(_word_ngram_kernel(n), "c_id long, ngram string")
            .toPandas()
            .sort_values(["c_id", "ngram"])
            .reset_index(drop=True)
        )
        assert expr_side.equals(kern_side), f"n={n}: kernel != expr path"
