"""Property tests for the LLM-pipeline operators: LSH families verified
against exact similarity measures (SURVEY.md §5.4 model)."""

from pyspark.sql import functions as F

from parquet_on_fhir_spark.api import load_table
from parquet_on_fhir_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    simhash_candidates,
)
from parquet_on_fhir_spark.operators.similarity import ann_topk, brute_force_topk


def _docs_plus_near_dups(spark, sf_dir, n=40):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") < n).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" small tail change")).alias("text"),
    )
    return d, d.unionAll(dups)


def test_exact_dedup_removes_only_true_dups(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionAll(d.select((F.col("doc_id") + 999).alias("doc_id"), "text"))
    kept = exact_dedup(doubled, "text", "doc_id")
    assert kept.count() == d.select("text").distinct().count()
    # survivor is the minimum id per content
    mins = doubled.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    assert kept.select("doc_id").exceptAll(mins.select("doc_id")).count() == 0


def test_minhash_lsh_finds_planted_near_dups(spark, sf_dir):
    d, corpus = _docs_plus_near_dups(spark, sf_dir)
    sigs = minhash_signatures(corpus, "text", "doc_id", num_hashes=32)
    pairs = minhash_lsh_pairs(sigs, "doc_id", num_bands=8, jaccard_threshold=0.4)
    planted = pairs.filter(
        (F.col("id_b") - F.col("id_a") == 1000000) & (F.col("id_a") < 40)
    )
    # high-Jaccard planted pairs: expect strong recall (banding (8x4) @ j~0.9)
    assert planted.count() >= 32


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_dir):
    d, corpus = _docs_plus_near_dups(spark, sf_dir, n=20)
    sigs = minhash_signatures(corpus, "text", "doc_id", num_hashes=32)
    pairs = minhash_lsh_pairs(sigs, "doc_id", num_bands=8, jaccard_threshold=0.3)
    texts = corpus.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("text_a")
    )
    texts_b = corpus.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("text_b")
    )
    joined = pairs.join(texts, "id_a").join(texts_b, "id_b").select(
        "id_a", "id_b", "est_jaccard",
        ngram_jaccard(F.col("text_a"), F.col("text_b")).alias("exact_jaccard"),
    )
    rows = joined.collect()
    assert rows
    err = [abs(r.est_jaccard - r.exact_jaccard) for r in rows]
    assert sum(err) / len(err) < 0.15  # 32-hash estimator tolerance


def test_simhash_near_dups_have_small_hamming(spark, sf_dir):
    d, corpus = _docs_plus_near_dups(spark, sf_dir)
    fps = simhash(corpus, "text", "doc_id")
    a = fps.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("fp_a"))
    b = fps.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("fp_b"))
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    # planted near-dup pairs: small distance
    planted = (
        a.join(b, F.col("id_b") - F.col("id_a") == 1000000)
        .select(hamming.alias("h"))
        .agg(F.avg("h"))
        .collect()[0][0]
    )
    # random unrelated pairs: distance near 32 (half of 64 bits)
    random_pairs = (
        a.filter(F.col("id_a") < 30)
        .join(b, F.col("id_b") == 400 - F.col("id_a"))
        .select(hamming.alias("h"))
        .agg(F.avg("h"))
        .collect()[0][0]
    )
    assert planted < 10 < random_pairs

    # pigeonhole guarantee: every pair with distance <= 3 is a candidate
    close = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(hamming <= 3)
        .select("id_a", "id_b")
    )
    cands = simhash_candidates(fps, "doc_id", max_hamming=3).select("id_a", "id_b")
    assert close.exceptAll(cands).count() == 0


def test_ann_recall_vs_brute_force(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = brute_force_topk(e, queries, k=5).select("q_id", "vec_id")
    approx = ann_topk(e, queries, dim=64, k=5, n_planes=4, n_tables=8).select(
        "q_id", "vec_id"
    )
    hits = exact.intersect(approx).count()
    recall = hits / exact.count()
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_brute_force_topk_self_similarity_excluded(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    res = brute_force_topk(e, queries, k=5)
    assert res.filter(F.col("q_id") == F.col("vec_id")).count() == 0
    assert res.groupBy("q_id").count().filter(F.col("count") != 5).count() == 0
    # cosine bounded
    assert res.filter((F.col("cosine") > 1.000001) | (F.col("cosine") < -1.000001)).count() == 0


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    from parquet_on_fhir_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = brute_force_topk(e, queries, k=5).select("q_id", "vec_id")
    approx = ivf_topk(e, queries, k=5, n_centroids=8, n_probe=4).select(
        "q_id", "vec_id"
    )
    recall = exact.intersect(approx).count() / exact.count()
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_approx_aggregates_within_tolerance(spark, sf_dir):
    """Rows-only approx operators are still bounded: HLL within rsd,
    approx_percentile within its accuracy band of the exact values."""
    l = load_table(spark, sf_dir, "lineitem")
    exact = l.select(
        F.countDistinct("l_partkey").alias("nd"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
    ).collect()[0]
    approx = l.select(
        F.approx_count_distinct("l_partkey", 0.02).alias("nd"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
    ).collect()[0]
    assert abs(approx.nd - exact.nd) / exact.nd < 0.1
    assert abs(approx.p50 - exact.p50) / exact.p50 < 0.01


def test_curate_corpus_pipeline(spark, sf_dir):
    from parquet_on_fhir_spark.operators.pipeline import curate_corpus

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant exact dups and near dups
    exact_copies = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    near_copies = d.filter(F.col("doc_id").between(10, 19)).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    corpus = d.unionAll(exact_copies).unionAll(near_copies)

    curated = curate_corpus(corpus, min_quality=0.0, near_dup_threshold=0.6)
    ids = {r.doc_id for r in curated.select("doc_id").collect()}
    # exact dups gone (min-id survivors kept)
    assert not any(i >= 1000000 and i < 2000000 for i in ids)
    # planted near-dups heavily removed
    surviving_near = sum(1 for i in ids if i >= 2000000)
    assert surviving_near <= 3
    # the bulk of distinct originals survive (the synthetic corpus shares a
    # tiny vocabulary, so some original-original pairs are genuine near-dups)
    assert sum(1 for i in ids if i < 1000000) >= 450

    budgeted = curate_corpus(corpus, min_quality=0.0, token_budget=5000)
    total = budgeted.agg(F.sum("n_tokens")).collect()[0][0]
    assert total <= 5000
    # greedy by quality: the selected set's min quality >= excluded max quality - eps
    sel = budgeted.agg(F.min("quality")).collect()[0][0]
    assert sel is not None

    # the two-pass cutoff is row-identical to the global greedy window
    from pyspark.sql import Window

    unbudgeted = curate_corpus(corpus, min_quality=0.0)
    w = Window.orderBy(F.desc("quality"), F.col("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref_ids = {
        r.doc_id
        for r in unbudgeted.withColumn("__run", F.sum("n_tokens").over(w))
        .filter(F.col("__run") <= 5000)
        .select("doc_id")
        .collect()
    }
    got_ids = {r.doc_id for r in budgeted.select("doc_id").collect()}
    assert got_ids == ref_ids


def test_embedding_near_dup_lsh_recall(spark, sf_dir):
    """LSH-bucketed near-dup must (a) be a subset of the exact pair set,
    (b) achieve full recall on planted near-identical vectors — the
    regime near-dedup actually targets (theta -> 0 => collision prob -> 1)."""
    from parquet_on_fhir_spark.operators.dedup import embedding_near_dup_pairs
    from parquet_on_fhir_spark.api import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings").limit(200).cache()
    # plant near-identical copies (tiny perturbation on one coordinate)
    dup = e.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x + F.when(i == 0, F.lit(1e-4)).otherwise(F.lit(0.0))
        ).alias("embedding"),
        "label",
    )
    both = e.unionByName(dup)
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            both, "vec_id", "embedding", threshold=0.99, exact=True
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            both, "vec_id", "embedding", threshold=0.99, n_planes=4, n_tables=8, dim=64
        ).collect()
    }
    planted = {(i, i + 1000000) for i in range(20)}
    assert planted <= exact
    assert lsh <= exact          # verify step: no false positives
    assert planted <= lsh        # full recall in the near-identical regime


def test_curate_corpus_embedding_stage(spark, sf_dir):
    """The optional embedding near-dedup stage drops the higher id of a
    planted near-identical pair, without touching unrelated docs."""
    from pyspark.sql import functions as F
    from parquet_on_fhir_spark.api import load_table
    from parquet_on_fhir_spark.operators.pipeline import curate_corpus

    docs = load_table(spark, sf_dir, "documents").limit(100).cache()
    emb = load_table(spark, sf_dir, "embeddings").limit(100).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    # plant a semantic duplicate of doc 0 under a high id: same text
    # slightly edited (so exact/minhash dedup won't always kill it) and
    # an epsilon-perturbed copy of its embedding
    dup_doc = docs.filter(F.col("doc_id") == 0).select(
        F.lit(999999).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" completely different tail "
                 "words appended to break the shingle overlap badly")).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )
    dup_emb = emb.filter(F.col("doc_id") == 0).select(
        F.lit(999999).cast("long").alias("doc_id"),
        F.transform("embedding", lambda x: x + F.lit(1e-5)).alias("embedding"),
    )
    curated = curate_corpus(
        docs.unionByName(dup_doc),
        min_quality=0.0,
        near_dup_threshold=0.99,
        embeddings=emb.unionByName(dup_emb),
        embedding_threshold=0.99,
    )
    ids = {r.doc_id for r in curated.select("doc_id").collect()}
    assert 0 in ids and 999999 not in ids


def test_minhash_lsh_rejects_indivisible_bands(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(10)
    sigs = minhash_signatures(d, "text", "doc_id", num_hashes=32)
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(sigs, "doc_id", num_bands=5)
    # explicit override also validated
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(sigs.select("doc_id", "minhash"), "doc_id",
                          num_bands=7, num_hashes=32)


def test_lsh_bucket_cap_bounds_boilerplate_corpus(spark, caplog):
    """A corpus of near-identical boilerplate puts everything in one LSH
    bucket: the cap must keep the candidate-pair count bounded (and log
    the drop) instead of going O(n^2)."""
    import logging

    n = 2000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the same boilerplate template text repeated "),
                 (F.col("id") % 3).cast("string")).alias("text"),
    )
    sigs = minhash_signatures(d, "text", "doc_id", num_hashes=16)
    with caplog.at_level(logging.WARNING,
                         logger="parquet_on_fhir_spark.operators.dedup"):
        pairs = minhash_lsh_pairs(sigs, "doc_id", num_bands=4,
                                  max_bucket_size=100, log_dropped=True)
        assert pairs.count() == 0  # every bucket oversized -> dropped
    assert any("bucket cap" in r.message for r in caplog.records)

    # simhash path honors the cap too
    fp = simhash(d, "text", "doc_id")
    cands = simhash_candidates(fp, "doc_id", max_bucket_size=100)
    assert cands.count() == 0


def test_embedding_near_dup_empty_corpus(spark):
    from parquet_on_fhir_spark.operators.dedup import embedding_near_dup_pairs

    e = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = embedding_near_dup_pairs(e, "vec_id", "embedding")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "cosine"]


def test_ivf_sampled_training_keeps_recall(spark, sf_dir):
    from parquet_on_fhir_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = brute_force_topk(e, queries, k=5).select("q_id", "vec_id")
    approx = ivf_topk(e, queries, k=5, n_centroids=8, n_probe=4,
                      max_train_rows=64).select("q_id", "vec_id")
    recall = exact.intersect(approx).count() / exact.count()
    assert recall >= 0.5, f"IVF (sampled fit) recall too low: {recall}"


def test_int8_quantization_roundtrip(spark, sf_dir):
    """Quantize/dequantize embeddings: codes in [-127,127], scale =
    abs-max, reconstruction error bounded by half a quantization step,
    and cosine similarity preserved to ~1%."""
    import math

    from parquet_on_fhir_spark.api import load_table
    from parquet_on_fhir_spark.functions.vectors import (
        dequantize_int8,
        quantization_mse,
        quantize_int8,
    )

    e = load_table(spark, sf_dir, "embeddings").limit(50)
    q = e.select("vec_id", "embedding", quantize_int8("embedding").alias("q"))
    rows = q.select(
        "vec_id",
        "embedding",
        "q",
        quantization_mse("embedding", "q").alias("mse"),
        dequantize_int8("q").alias("back"),
    ).collect()
    assert rows
    for r in rows:
        v, codes, scale = r["embedding"], r["q"]["codes"], r["q"]["scale"]
        assert abs(scale - max(abs(x) for x in v)) < 1e-6
        assert all(-127 <= c <= 127 for c in codes)
        step = scale / 127.0 if scale else 0.0
        for x, c, b in zip(v, codes, r["back"]):
            assert c == round(x * 127.0 / scale) if scale else c == 0
            assert abs(x - b) <= step / 2 + 1e-6
        assert r["mse"] <= (step / 2) ** 2 + 1e-9
        # cosine(v, back) close to 1
        dot = sum(a * b for a, b in zip(v, r["back"]))
        nv = math.sqrt(sum(a * a for a in v))
        nb = math.sqrt(sum(b * b for b in r["back"]))
        if nv and nb:
            assert dot / (nv * nb) > 0.99


def test_curate_corpus_cluster_closure(spark):
    """cluster_closure=True collapses a transitive near-dup chain to ONE
    survivor where the default pair-drop keeps every local minimum."""
    from parquet_on_fhir_spark.operators.pipeline import curate_corpus

    base = "the quick brown fox jumps over the sleeping dog near the old barn " * 4
    rows = [
        (1, base + "alpha beta gamma delta"),
        (5, base + "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (10, base + "alpha beta gamma delta epsilon zeta"),
        (20, "entirely different content about distributed query planning " * 6),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_quality=0.0, near_dup_threshold=0.35)
    default_ids = {r["doc_id"] for r in curate_corpus(docs, **kw).collect()}
    closed_ids = {r["doc_id"] for r in curate_corpus(docs, cluster_closure=True, **kw).collect()}
    assert 20 in default_ids and 20 in closed_ids
    # closure keeps exactly one of the near-dup chain {1,5,10}
    assert len(closed_ids - {20}) == 1 and closed_ids - {20} == {1}
    # closure never keeps more than the pair-drop
    assert closed_ids <= default_ids


def test_incremental_dedup(spark):
    from parquet_on_fhir_spark.operators.dedup import incremental_dedup

    kept = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog by the river bank"),
            (2, "distributed query engines shuffle data between executor nodes"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog by the river bank"),  # exact
            (11, "the quick brown fox jumps over the lazy dog by the river bank today"),  # near
            (12, "entirely novel content with no overlap whatsoever in any shingle"),  # fresh
        ],
        "doc_id long, text string",
    )
    out = incremental_dedup(new, kept, "text", "doc_id", jaccard_threshold=0.35)
    assert [r["doc_id"] for r in out.collect()] == [12]
    # exact-only mode keeps the near-dup
    out2 = incremental_dedup(new, kept, "text", "doc_id", jaccard_threshold=None)
    assert sorted(r["doc_id"] for r in out2.collect()) == [11, 12]


def test_semantic_dedup_planted_duplicates(spark):
    """Well-separated clusters with planted near-identical members: the
    paraphrase pairs collapse to one survivor, distinct members all
    survive, and transitive chains (a~b~c with a~c below threshold)
    still collapse to ONE survivor."""
    import math
    import random

    from parquet_on_fhir_spark.operators.dedup import semantic_dedup

    rng = random.Random(7)
    rows = []

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # two far-apart cluster centers in 8-d
    centers = [[10.0] + [0.0] * 7, [0.0] * 7 + [10.0]]
    vid = 0
    for c in centers:
        # 5 distinct members (big noise)
        for _ in range(5):
            rows.append((vid, unit([x + rng.uniform(-3, 3) for x in c])))
            vid += 1
        # a duplicate pair (tiny noise around one point)
        base = [x + rng.uniform(-3, 3) for x in c]
        for _ in range(2):
            rows.append((vid, unit([x + rng.uniform(-1e-3, 1e-3) for x in base])))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, n_clusters=2, threshold=0.999).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(by_id) == len(rows)
    # exactly one duplicate dropped per planted pair
    dropped = [r for r in out if not r.is_survivor]
    assert len(dropped) == 2
    # each dropped row's component is its pair partner (min id of pair)
    for r in dropped:
        assert r.component == r.vec_id - 1
    # distinct members survive as their own component
    survivors = [r for r in out if r.is_survivor]
    assert all(r.component == r.vec_id for r in survivors)


def test_classifier_score_matches_python_reference(spark):
    """classifier_score == a plain-Python reimplementation of
    hash-bucket → weight → sigmoid(mean) on hand-built docs."""
    import hashlib
    import math

    from parquet_on_fhir_spark.operators.curation import classifier_score

    weights = [((i * 7) % 11 - 5) / 10.0 for i in range(16)]
    docs = [
        (1, "the quick brown fox"),
        (2, "spam spam spam buy now"),
        (3, "a"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["clf_score"]
        for r in classifier_score(df, weights, bias=0.25, seed=3).collect()
    }

    def bucket(tok):
        h = int(hashlib.md5(f"clf3:{tok}".encode()).hexdigest()[:15], 16)
        return h % len(weights)

    for doc_id, text in docs:
        toks = text.lower().strip().split()
        toks = toks if toks else [""]  # split('') -> [''] in both engines
        score = 0.25 + sum(weights[bucket(tk)] for tk in toks) / max(len(toks), 1)
        want = 1.0 / (1.0 + math.exp(-score))
        assert abs(got[doc_id] - want) < 1e-12, (doc_id, got[doc_id], want)


def test_temperature_mixture_flattens_sources(spark):
    """alpha=0 targets EQUAL per-source row counts regardless of the
    natural skew; alpha=1 reproduces the natural proportions; a budget
    >= N keeps everything; and the kept set is layout-independent."""
    from parquet_on_fhir_spark.operators.curation import temperature_mixture

    rows = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    kept_all = temperature_mixture(df, budget=5000, alpha=0.5)
    assert kept_all.count() == 1000

    flat = temperature_mixture(df, budget=200, alpha=0.0, seed=7)
    by_src = {
        r["source"]: r["n"]
        for r in flat.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # alpha=0: both sources target 100 rows; small (100 rows, rate 1.0)
    # keeps everything, big keeps a hash-thinned ~100
    assert by_src["small"] == 100
    assert 70 <= by_src["big"] <= 130

    natural = temperature_mixture(df, budget=200, alpha=1.0, seed=7)
    by_nat = {
        r["source"]: r["n"]
        for r in natural.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # alpha=1: rates are uniform 0.2 across sources
    assert 150 <= by_nat["big"] <= 210 and by_nat.get("small", 0) <= 40

    a = sorted(r["doc_id"] for r in flat.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mixture(
            df.repartition(13, "doc_id"), budget=200, alpha=0.0, seed=7
        ).collect()
    )
    assert a == b


def test_embedding_moments_matches_numpy(spark):
    """Distributed Gram-partial covariance == numpy's population
    covariance on a small random matrix, across multiple partitions."""
    import numpy as np

    from parquet_on_fhir_spark.operators.similarity import embedding_moments

    rng = np.random.default_rng(11)
    m = rng.normal(size=(257, 5))  # odd count to exercise ragged batches
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(m)],
        ["vec_id", "embedding"],
    ).repartition(7)
    got = {
        (r["i"], r["j"]): (r["cov"], r["mean_i"], r["mean_j"])
        for r in embedding_moments(df).collect()
    }
    cov = np.cov(m, rowvar=False, bias=True)
    mean = m.mean(axis=0)
    assert len(got) == 5 * 6 // 2
    for (i, j), (c, mi, mj) in got.items():
        assert i <= j
        assert abs(c - cov[i, j]) < 1e-9, (i, j)
        assert abs(mi - mean[i]) < 1e-12 and abs(mj - mean[j]) < 1e-12


def test_bpe_pair_counts_matches_python_reference(spark):
    from collections import Counter

    from parquet_on_fhir_spark.operators.text import bpe_pair_counts

    docs = [(1, "low lower lowest"), (2, "new newer 日本語 ab a")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = [(r["pair"], r["cnt"]) for r in bpe_pair_counts(df, top_k=100).collect()]

    ref = Counter()
    for _, text in docs:
        for w in text.lower().strip().split():
            for i in range(len(w) - 1):
                ref[w[i : i + 2]] += 1
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want


def test_pca_matches_numpy_reference(spark):
    """fit_pca + pca_project == direct numpy PCA on the same matrix:
    eigenvalues, per-component projections (up to the shared sign
    canonicalization), and unit variance after whitening."""
    import numpy as np

    from parquet_on_fhir_spark.operators.similarity import fit_pca, pca_project

    rng = np.random.default_rng(5)
    # anisotropic data: strong axes so component order is unambiguous
    base = rng.normal(size=(400, 6)) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    mix = rng.normal(size=(6, 6))
    m = base @ mix + rng.normal(size=6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(m)],
        ["vec_id", "embedding"],
    ).repartition(5)

    mean, comps, eigvals = fit_pca(df, k=3)
    cov = np.cov(m, rowvar=False, bias=True)
    ref_vals, ref_vecs = np.linalg.eigh(cov)
    order = np.argsort(ref_vals)[::-1][:3]
    assert np.allclose(mean, m.mean(axis=0), atol=1e-9)
    assert np.allclose(eigvals, ref_vals[order], rtol=1e-9)
    for got, idx in zip(comps, order):
        v = ref_vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        assert np.allclose(got, v, atol=1e-9)

    proj = pca_project(df, mean, comps)
    got = np.array(
        [r["pca"] for r in proj.orderBy("vec_id").collect()]
    )
    want = (m - m.mean(axis=0)) @ np.array(comps).T
    assert np.allclose(got, want, atol=1e-9)

    white = pca_project(df, mean, comps, whiten_eigvals=eigvals)
    w = np.array([r["pca"] for r in white.orderBy("vec_id").collect()])
    assert np.allclose(w.var(axis=0), 1.0, atol=1e-6)


def test_ngram_novelty_curve(spark):
    """ngram_novelty: hand-computed batch novelty over a 4-doc corpus
    (first batch 100% novel; later batches count only first-seen
    grams' occurrences as new)."""
    from parquet_on_fhir_spark.operators.text import ngram_novelty

    docs = [
        (0, "a b c d"),       # batch 0: ab bc cd
        (50, "a b c e"),      # batch 0: ab bc ce
        (120, "b c d f g"),   # batch 1: bc cd df fg (df/fg new)
        (250, "x y z"),       # batch 2: xy yz (all new)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    nv = {
        r.batch: r
        for r in ngram_novelty(df, "doc_id", "text", 2, 100).collect()
    }
    b0, b1, b2 = nv[0], nv[1], nv[2]
    assert (b0.occurrences, b0.new_occurrences) == (6, 6)
    assert (b0.distinct_grams, b0.new_distinct_grams) == (4, 4)
    assert b0.novelty_rate == 1.0
    assert (b1.occurrences, b1.new_occurrences) == (4, 2)
    assert (b1.distinct_grams, b1.new_distinct_grams) == (4, 2)
    assert abs(b1.novelty_rate - 0.5) < 1e-12
    assert (b2.occurrences, b2.new_occurrences) == (2, 2)


def test_effective_sample_size_kish(spark):
    """effective_sample_size: Kish ESS over exact-dup clusters —
    uniques give ESS = N, a skewed megacluster drags ESS toward
    n_clusters' harmonic bound."""
    from parquet_on_fhir_spark.operators.dedup import (
        effective_sample_size,
    )

    texts = ["u%d" % i for i in range(10)] + ["dup"] * 5 + ["dup2"] * 2
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    r = effective_sample_size(df, "text").collect()[0]
    assert (r.n_docs, r.n_clusters) == (17, 12)
    assert abs(r.dup_rate - (1 - 12 / 17)) < 1e-12
    assert abs(r.ess - 144 / 10.7) < 1e-9  # C^2 / (10·1 + 1/5 + 1/2)
    uniq = spark.createDataFrame([("t%d" % i,) for i in range(8)], "text string")
    ru = effective_sample_size(uniq, "text").collect()[0]
    assert ru.ess == 8.0 and ru.dup_rate == 0.0


def test_embedding_isotropy_identity(spark):
    """embedding_isotropy vs the O(n^2) gram-matrix reference: the
    ||sum v_hat||^2 identity must reproduce the exact mean pairwise
    cosine; zero vectors are excluded."""
    import numpy as np

    from parquet_on_fhir_spark.operators.similarity import (
        embedding_isotropy,
    )

    rng = np.random.RandomState(13)
    v = rng.normal(0.1, 1.0, (50, 8))
    rows = [(i, [float(x) for x in vv]) for i, vv in enumerate(v)]
    rows.append((50, [0.0] * 8))  # zero vector: excluded
    df = spark.createDataFrame(rows, "id int, embedding array<double>")
    r = embedding_isotropy(df, "embedding").collect()[0]
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    g = vn @ vn.T
    ref = (g.sum() - np.trace(g)) / (50 * 49)
    assert r.n == 50 and r.dim == 8
    assert abs(r.mean_norm - np.linalg.norm(v, axis=1).mean()) < 1e-9
    assert abs(r.mean_cosine - ref) < 1e-9


def test_script_profile_counts(spark):
    """script_profile: hand-counted Latin/digit/space/CJK census and
    the leftover bucket; fractions NULL-guarded on empty groups."""
    from parquet_on_fhir_spark.operators.text import script_profile

    df = spark.createDataFrame(
        [("a", "Hello 42 世界"), ("a", "abc!"), ("b", "你好 world")],
        "source string, text string",
    )
    rows = {r.group: r for r in script_profile(df).collect()}
    a, b = rows["a"], rows["b"]
    assert (a.n_docs, a.chars, a.latin, a.digit, a.space, a.cjk, a.other) == (
        2, 15, 8, 2, 2, 2, 1,
    )
    assert abs(a.latin_frac - 8 / 15) < 1e-12
    assert (b.chars, b.latin, b.cjk) == (8, 5, 2)
    assert abs(b.cjk_frac - 0.25) < 1e-12


def test_round10_null_input_guards(spark):
    """Round-10 self-review: NULL texts must not fuse into a phantom
    ESS cluster; NULL incidences are excluded from the wedge join."""
    from parquet_on_fhir_spark.operators.dedup import (
        effective_sample_size,
    )
    from parquet_on_fhir_spark.operators.graph import common_neighbors

    texts = [("a",), ("a",), ("b",), (None,), (None,), (None,)]
    df = spark.createDataFrame(texts, "text string")
    r = effective_sample_size(df, "text").collect()[0]
    assert (r.n_docs, r.n_clusters) == (3, 2)  # NULLs excluded entirely

    inc = spark.createDataFrame(
        [(1, "p"), (2, "p"), (None, "p"), (1, None)], "n int, a string"
    )
    out = common_neighbors(inc, "n", "a").collect()
    assert len(out) == 1
    assert (out[0].node_a, out[0].node_b, out[0].common) == (1, 2, 1)
    assert out[0].degree_a == 1  # the (1, NULL) incidence did not count


def test_heaps_law_matches_numpy_fit(spark):
    """heaps_law (r11) vs a numpy log-log least-squares fit over the
    same cumulative (tokens, vocab) points, on a corpus built so the
    points are hand-enumerable; a single-batch corpus yields a
    degenerate (NaN) slope rather than a wrong one."""
    import math

    import numpy as np

    from parquet_on_fhir_spark.operators.text import heaps_law

    docs = [
        (0, "a b c"),          # batch 0: T=3, V=3
        (1, "a b d d"),        # batch 1: +4 occ, +1 new (d)
        (2, "e f a"),          # batch 2: +3 occ, +2 new
        (3, "a a a a"),        # batch 3: +4 occ, +0 new
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = heaps_law(df, "doc_id", "text", batch_width=1).collect()[0]
    T = np.cumsum([3, 4, 3, 4])
    V = np.cumsum([3, 1, 2, 0])
    x = np.round(np.log(T), 12)
    y = np.round(np.log(V), 12)
    beta, lnk = np.polyfit(x, y, 1)
    assert row["n_points"] == 4
    assert row["tokens_total"] == 14 and row["vocab_total"] == 6
    assert abs(row["beta"] - beta) < 1e-9
    assert abs(row["k"] - math.exp(lnk)) < 1e-9


def test_bpe_encode_matches_independent_reference(spark):
    """bpe_encode (merge APPLICATION) vs an independent pure-python
    greedy leftmost-non-overlap BPE applier, including overlapping
    same-symbol chains, regex-special symbols, fully-merged words,
    and empty documents."""
    from parquet_on_fhir_spark.operators.text import bpe_encode

    merges = [
        ("a", "b"),
        ("e", "</w>"),
        ("t", "ab"),
        ("tab", "l"),
        ("tabl", "e</w>"),
        ("a", "a"),  # overlapping chain: "aaa" -> ["aa", "a"]
        (".", "*"),  # regex-special symbols must be escaped
    ]

    def ref_tokens(word):
        t = list(word) + ["</w>"]
        for left, right in merges:
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == left and t[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            t = out
        return t

    docs = [
        (0, "table tableau stable"),
        (1, "aaa aaaa ab"),
        (2, "x.*y .* table"),
        (3, "   "),
        (4, "the quick brown fox"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    for i, text in docs:
        ws = [w for w in text.lower().split() if w]
        want_tok = sum(len(ref_tokens(w)) for w in ws)
        g = got[i]
        assert (g["n_words"], g["n_tokens"]) == (len(ws), want_tok), (
            i, dict(g.asDict()), len(ws), want_tok,
        )
        if ws:
            assert g["fertility"] == want_tok / len(ws)
        else:
            assert g["fertility"] is None


def test_bpe_encode_roundtrips_training(spark):
    """merges produced by bpe_train_merges feed bpe_encode directly:
    fertility must strictly improve (fewer tokens) as merges apply."""
    from parquet_on_fhir_spark.operators.text import (
        bpe_encode,
        bpe_train_merges,
    )

    docs = [(i, "lower lowest newer newest low new") for i in range(3)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    trained = [
        (r["left"], r["right"])
        for r in bpe_train_merges(df, rounds=6).collect()
    ]
    assert len(trained) == 6
    none_ = bpe_encode(df, []).collect()[0]["n_tokens"]
    some = bpe_encode(df, trained).collect()[0]["n_tokens"]
    assert some < none_


def test_compressed_payload_audit(spark):
    """compression detection, bounded inflate, and THE BOMB GUARD:
    a ~10 KB zlib payload expanding to 10 MB against a 1 MB cap
    reports truncated=True at exactly the cap — it never materializes
    the expansion. Corrupt streams -> out_len NULL; zstd detect-only;
    raw passthrough."""
    import gzip
    import zlib

    from parquet_on_fhir_spark.operators.curation import (
        compressed_payload_audit,
    )

    text = b"the quick brown fox " * 500        # 10_000 bytes
    bomb = zlib.compress(b"a" * (10 * 1024 * 1024), 9)
    rows = [
        (1, bytearray(gzip.compress(text))),
        (2, bytearray(zlib.compress(text))),
        (3, bytearray(bomb)),
        (4, bytearray(b"\x28\xb5\x2f\xfd" + b"\x00" * 20)),  # zstd magic
        (5, bytearray(b"plain old bytes")),
        (6, bytearray(gzip.compress(text)[:40])),            # truncated gzip
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = {
        r["media_id"]: r
        for r in compressed_payload_audit(
            media, max_out_bytes=1 << 20
        ).collect()
    }
    assert out[1]["codec"] == "gzip" and out[1]["out_len"] == len(text)
    assert out[1]["truncated"] is False
    assert abs(out[1]["ratio"] - round(len(text) / out[1]["in_len"], 4)) < 1e-9
    assert out[2]["codec"] == "zlib" and out[2]["out_len"] == len(text)
    assert out[3]["codec"] == "zlib"
    assert out[3]["out_len"] == 1 << 20 and out[3]["truncated"] is True
    assert out[4]["codec"] == "zstd" and out[4]["out_len"] is None
    assert out[5]["codec"] == "raw" and out[5]["out_len"] == 15
    assert out[6]["codec"] == "gzip" and out[6]["out_len"] is None


def test_html_extract_main_content(spark):
    """HTML main-content extraction (r13, jusText-lite): script/style
    content dropped, entities decoded, block segmentation at
    block-level tags, link-density + length classification keeps the
    article and drops nav/footer/ads; title from <head>; malformed
    input degrades, never raises."""
    from parquet_on_fhir_spark.operators.html import (
        extract_main_text,
        html_extract,
    )

    page = (
        "<html><head><title>My Article &amp; More</title>"
        '<script>var x = "<p>not text</p>";</script>'
        "<style>.a{color:red}</style></head><body>"
        "<nav><a href=/>Home</a> <a href=/b>Blog</a>"
        " <a href=/c>Contact</a></nav>"
        "<h1>A Heading Long Enough To Keep</h1>"
        "<p>This is the first real paragraph of the article, with"
        " enough characters to pass the block threshold and no links"
        " at all.</p>"
        "<p>Second paragraph mentions <a href=x>one inline link</a>"
        " but stays mostly prose, so its link density is comfortably"
        " under the bar.</p>"
        "<div class=ad>Buy now!</div>"
        "<footer><a href=/t>Terms</a> | <a href=/p>Privacy</a></footer>"
        "</body></html>"
    )
    info = extract_main_text(page)
    assert info["title"] == "My Article & More"
    assert info["n_blocks"] == 6
    assert info["n_kept"] == 3  # heading + two paragraphs
    lines = info["text"].split("\n")
    assert lines[0] == "A Heading Long Enough To Keep"
    assert lines[1].startswith("This is the first real paragraph")
    assert "not text" not in info["text"]      # script dropped
    assert "Buy now" not in info["text"]       # short ad dropped
    assert "Home" not in info["text"]          # link-dense nav dropped
    assert "Terms" not in info["text"]         # footer dropped
    # nav/footer contribute all-link blocks; page density is in (0, 1)
    assert 0.0 < info["link_density"] < 0.5

    # empty / malformed inputs degrade gracefully
    assert extract_main_text("")["n_blocks"] == 0
    assert extract_main_text("just plain text with no markup at all"
                             )["n_kept"] == 1
    assert extract_main_text("<p><a>unclosed everything")["n_blocks"] >= 0

    # operator end-to-end
    df = spark.createDataFrame([(7, page)], "doc_id long, html string")
    row = html_extract(df).collect()[0]
    assert row["n_kept"] == 3 and row["title"] == "My Article & More"


def test_warc_records(spark):
    """WARC extraction (r13, ISO 28500): header/field parsing, exact
    Content-Length segmentation, HTTP status from response records,
    member-gzip layout (the Common Crawl shape), the bounded payload
    cap, hostile-input quarantine (rec_idx = -1, never an exception),
    and the operator end-to-end."""
    from parquet_on_fhir_spark.operators.warc import (
        build_warc,
        parse_warc,
        warc_records,
    )

    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html>hello</html>")
    recs = [
        ("warcinfo", None, "2026-08-16T00:00:00Z", b"software: t\r\n"),
        ("request", "https://example.org/", "2026-08-16T00:00:01Z",
         b"GET / HTTP/1.1\r\n"),
        ("response", "https://example.org/", "2026-08-16T00:00:02Z", http),
    ]
    for gz in (False, True):
        out = parse_warc(build_warc(recs, gzip_members=gz))
        assert [r["rec_type"] for r in out] == [
            "warcinfo", "request", "response"]
        assert out[2]["http_status"] == 200
        assert out[2]["content_length"] == len(http)
        assert out[1]["target_uri"] == "https://example.org/"
    # payload cap: prefix bounded, length still exact
    big = build_warc(
        [("response", "u", "d", b"HTTP/1.1 404 NF\r\n\r\n" + b"x" * 5000)])
    r = parse_warc(big, max_payload_bytes=100)[0]
    assert (r["content_length"], len(r["payload_prefix"]),
            r["http_status"]) == (5019, 100, 404)
    # hostile inputs raise ValueError (incl. corrupt gzip members)
    import pytest

    for bad in (b"garbage", build_warc(recs)[:40],
                b"\x1f\x8b" + b"\x00" * 20):
        with pytest.raises(ValueError):
            parse_warc(bad)
    # operator: good archive + quarantined junk
    media = spark.createDataFrame(
        [(1, bytearray(build_warc(recs, gzip_members=True))),
         (2, bytearray(b"not a warc"))],
        "media_id long, content binary",
    )
    rows = sorted(warc_records(media).collect(),
                  key=lambda r: (r["media_id"], r["rec_idx"]))
    assert [(r["media_id"], r["rec_idx"], r["rec_type"]) for r in rows] == [
        (1, 0, "warcinfo"), (1, 1, "request"), (1, 2, "response"),
        (2, -1, None),
    ]
    assert rows[2]["http_status"] == 200


def test_warc_gzip_bomb_quarantined(spark):
    """r13 advice (medium): a decompression-bomb gzip member must hit
    the bounded-inflate cap DURING chunked decompression — never
    materialize its full expansion first — and route to the
    rec_idx = -1 quarantine row through the operator."""
    import pytest

    from parquet_on_fhir_spark.operators.warc import (
        build_warc,
        parse_warc,
        warc_records,
    )

    bomb_payload = b"\x00" * (8 << 20)  # 8 MiB of zeros, ~8 KiB gzipped
    bomb = build_warc(
        [("response", "u", "d", bomb_payload)], gzip_members=True
    )
    assert len(bomb) < 20_000  # it really is a bomb
    with pytest.raises(ValueError, match="inflate cap"):
        parse_warc(bomb, max_member_bytes=1 << 20)
    # under the default (64 MiB) cap the same archive parses fine
    assert parse_warc(bomb)[0]["content_length"] == len(bomb_payload)
    media = spark.createDataFrame(
        [(1, bytearray(bomb))], "media_id long, content binary"
    )
    rows = warc_records(media, max_member_bytes=1 << 20).collect()
    assert [(r["media_id"], r["rec_idx"]) for r in rows] == [(1, -1)]


def test_robots_filter(spark):
    """RFC 9309 robots evaluation (r13): group selection (exact UA
    beats *; consecutive UA lines merge), wildcard/anchor patterns,
    longest-match + Allow-wins-ties precedence, empty Disallow,
    missing robots => allowed; operator end-to-end with the
    broadcast-rules/one-pass-URL shape."""
    from parquet_on_fhir_spark.operators.robots import (
        parse_robots,
        robots_allowed,
        robots_filter,
    )

    txt = (
        "User-agent: SparkBot\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/\n"
        "Disallow: /*.pdf$\n\n"
        "User-agent: *\nDisallow: /tmp/\n"
    )
    rules = parse_robots(txt, "sparkbot")
    assert robots_allowed(rules, "/private/secret") is False
    assert robots_allowed(rules, "/private/ok/f") is True   # longer Allow
    assert robots_allowed(rules, "/a/b.pdf") is False       # * and $
    assert robots_allowed(rules, "/a/b.pdfx") is True       # $ respected
    assert robots_allowed(rules, "/tmp/x") is True          # not the * group
    assert robots_allowed(parse_robots(txt, "nobody"), "/tmp/x") is False
    assert robots_allowed([], "/anything") is True          # no robots.txt
    # empty Disallow allows everything; tie -> Allow wins
    assert robots_allowed(parse_robots(
        "User-agent: *\nDisallow:\n", "x"), "/a") is True
    assert robots_allowed(
        [(False, "/dir/"), (True, "/dir/")], "/dir/f") is True

    robots = spark.createDataFrame(
        [("a.ex", txt), ("b.ex", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "a.ex", "https://a.ex/private/x"),
         (2, "a.ex", "https://a.ex/private/ok/x"),
         (3, "b.ex", "https://b.ex/anything"),
         (4, "c.ex", "https://c.ex/no/robots")],
        "id long, host string, url string",
    )
    got = {r["id"]: r["allowed"]
           for r in robots_filter(urls, robots,
                                  user_agent="sparkbot").collect()}
    assert got == {1: False, 2: True, 3: False, 4: True}

    # forced distribution modes agree with auto
    for mode in ("broadcast", "shuffle"):
        got_m = {r["id"]: r["allowed"]
                 for r in robots_filter(urls, robots, user_agent="sparkbot",
                                        distribute=mode).collect()}
        assert got_m == got, mode


def test_robots_filter_nested_columns(spark):
    """r13 advice: the old string-sliced simpleString schema broke on
    nested URL frames; the r14 join form must pass arbitrary columns
    (struct/array) through untouched."""
    from parquet_on_fhir_spark.operators.robots import robots_filter

    robots = spark.createDataFrame(
        [("a.ex", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [(1, "a.ex", "https://a.ex/private/x", {"d": 2}, [1, 2]),
         (2, "a.ex", "https://a.ex/pub/x", {"d": 3}, [])],
        "id long, host string, url string, "
        "meta struct<d:int>, tags array<int>",
    )
    rows = {r["id"]: r for r in robots_filter(urls, robots).collect()}
    assert rows[1]["allowed"] is False and rows[2]["allowed"] is True
    assert rows[1]["meta"]["d"] == 2 and rows[2]["tags"] == []
    # schema preserved + allowed appended
    out_cols = robots_filter(urls, robots).columns
    assert out_cols == ["id", "host", "url", "meta", "tags", "allowed"]


def test_robots_catalyst_fold_matches_python(spark):
    """Property pin: the Catalyst longest-match fold (join + HOF
    array_max over struct(len, is_allow)) agrees with the python twin
    robots_allowed on a randomized rule/path population covering *,
    $, nesting, ties, and regex metacharacters in paths."""
    import random

    from parquet_on_fhir_spark.operators.robots import (
        parse_robots,
        robots_allowed,
        robots_filter,
    )

    rng = random.Random(914)
    segs = ["a", "bb", "c.d", "x+y", "(z)", "pdf", "ok"]
    hosts, texts = [], {}
    for h in range(12):
        host = f"h{h}.ex"
        lines = ["User-agent: *"]
        for _ in range(rng.randint(0, 5)):
            verb = rng.choice(["Allow", "Disallow"])
            depth = rng.randint(0, 3)
            pat = "/" + "/".join(rng.choice(segs) for _ in range(depth))
            if rng.random() < 0.3:
                pat += "*" + rng.choice(segs)
            if rng.random() < 0.3:
                pat += "$"
            if rng.random() < 0.1:
                pat = ""
            lines.append(f"{verb}: {pat}")
        hosts.append(host)
        texts[host] = "\n".join(lines)
    url_rows = []
    for i in range(120):
        host = rng.choice(hosts)
        depth = rng.randint(0, 4)
        path = "/" + "/".join(rng.choice(segs) for _ in range(depth))
        url_rows.append((i, host, f"http://{host}{path}", path))
    robots = spark.createDataFrame(
        [(h, texts[h]) for h in hosts], "host string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [(i, h, u) for i, h, u, _ in url_rows],
        "id long, host string, url string",
    )
    got = {r["id"]: r["allowed"]
           for r in robots_filter(urls, robots).collect()}
    for i, host, _, path in url_rows:
        want = robots_allowed(parse_robots(texts[host], "*"), path)
        assert got[i] == want, (i, host, path, texts[host])


def test_mime_sniff_audit(spark):
    """Magic-byte sniffing vs claimed Content-Type (r13): every
    in-repo-decodable format identified, text/binary fallback, NULL
    claims propagate, mismatch flag."""
    import gzip

    import numpy as np

    from parquet_on_fhir_spark.operators.curation import (
        mime_sniff_audit,
        sniff_mime,
    )
    from parquet_on_fhir_spark.operators.multimodal import (
        encode_jpeg,
        encode_png,
        encode_webp_lossless,
    )

    img = np.full((8, 8, 3), 50, np.uint8)
    assert sniff_mime(encode_png(img)) == "image/png"
    assert sniff_mime(encode_jpeg(img)) == "image/jpeg"
    assert sniff_mime(encode_webp_lossless(img)) == "image/webp"
    assert sniff_mime(b"%PDF-1.7 ...") == "application/pdf"
    assert sniff_mime(gzip.compress(b"x")) == "application/gzip"
    assert sniff_mime(b"  <!DOCTYPE html><html>") == "text/html"
    assert sniff_mime(b"plain words " * 20) == "text/plain"
    assert sniff_mime(bytes(range(256)) * 4) == "application/octet-stream"

    media = spark.createDataFrame(
        [(1, "image/png", bytearray(encode_png(img))),
         (2, "image/png", bytearray(encode_jpeg(img))),   # lie
         (3, None, bytearray(b"hello text " * 10))],
        "media_id long, claimed_mime string, content binary",
    )
    rows = {r["media_id"]: r for r in mime_sniff_audit(media).collect()}
    assert rows[1]["mismatch"] is False
    assert rows[2]["mismatch"] is True
    assert rows[2]["sniffed_mime"] == "image/jpeg"
    assert rows[3]["mismatch"] is None
    assert rows[3]["sniffed_mime"] == "text/plain"


def test_charset_sniff_precedence_and_decode(spark):
    """r14 charset seam: the WHATWG-ish precedence ladder (BOM > HTTP
    header > meta prescan > UTF-8 probe > 1252 fallback), label
    normalization, the lying-UTF-16-meta rule, BOM stripping on
    decode, replace-not-raise on hostile bytes, and both operators
    end-to-end (raw decode_text + HTTP http_text)."""
    from parquet_on_fhir_spark.operators.encoding import (
        decode_payload,
        decode_text,
        http_text,
        normalize_charset,
        parse_http_response,
        sniff_charset,
    )

    # precedence ladder
    assert sniff_charset(b"\xef\xbb\xbfhi") == ("utf-8", "bom")
    assert sniff_charset("x".encode("utf-16")) == ("utf-16-le", "bom")
    assert sniff_charset(b"\xfe\xff\x00x") == ("utf-16-be", "bom")
    # BOM beats a contradicting header
    assert sniff_charset(b"\xef\xbb\xbfhi", "text/html; charset=latin-1") \
        == ("utf-8", "bom")
    # header beats meta
    assert sniff_charset(
        b'<meta charset="iso-8859-1">x', "text/html; charset=UTF-8"
    ) == ("utf-8", "http")
    assert sniff_charset(b'<meta charset="ISO-8859-1">x') \
        == ("iso-8859-1", "meta")
    # http-equiv form is caught by the same prescan
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=windows-1252">x'
    ) == ("windows-1252", "meta")
    # ASCII-readable meta claiming utf-16 is lying -> utf-8
    assert sniff_charset(b'<meta charset="utf-16">x') == ("utf-8", "meta")
    # unknown labels fall through the tier
    assert normalize_charset("not-a-charset") is None
    assert sniff_charset(b"plain", "text/plain; charset=bogus-9") \
        == ("utf-8", "heuristic")
    # valid multibyte utf-8 -> heuristic; broken high bytes -> 1252
    assert sniff_charset("café".encode()) == ("utf-8", "heuristic")
    assert sniff_charset(b"caf\xe9 legacy") == ("windows-1252", "fallback")
    # probe-window boundary: a multibyte char cut at probe_bytes still
    # counts as utf-8
    big = ("a" * 65535 + "é").encode("utf-8") + b"tail"
    assert sniff_charset(big)[0] == "utf-8"

    # decode strips the BOM the sniff consumed
    assert decode_payload(b"\xef\xbb\xbfhi", "utf-8", "bom") == "hi"
    assert decode_payload("hi".encode("utf-16"), "utf-16-le", "bom") == "hi"
    # hostile bytes replace, never raise (0x81 undefined in cp1252)
    assert "�" in decode_payload(b"\x81\x8d", "windows-1252",
                                      "fallback")

    # HTTP splitter
    st, hd, body = parse_http_response(
        b"HTTP/1.1 301 Moved\r\nLocation: /x\r\n"
        b"Content-Type: text/html; charset=ISO-8859-1\r\n\r\n<p>s\xe9</p>"
    )
    assert st == 301 and hd["content-type"].endswith("ISO-8859-1")
    assert body == b"<p>s\xe9</p>"
    assert parse_http_response(b"not http")[0] is None

    # operators end-to-end incl. NULL payload passthrough
    media = spark.createDataFrame(
        [(1, bytearray(b"\xef\xbb\xbfcaf\xc3\xa9"), None),
         (2, bytearray(b"caf\xe9"), "text/plain; charset=latin1"),
         (3, None, None)],
        "media_id long, content binary, content_type string",
    )
    rows = {r["media_id"]: r for r in decode_text(
        media, content_type_col="content_type").collect()}
    assert (rows[1]["charset"], rows[1]["text"]) == ("utf-8", "café")
    assert (rows[2]["charset"], rows[2]["text"]) == ("iso-8859-1", "café")
    assert rows[3]["charset"] is None and rows[3]["text"] is None

    http = spark.createDataFrame(
        [(1, bytearray(b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                       b"charset=windows-1252\r\n\r\n\x93q\x94"))],
        "media_id long, payload_prefix binary",
    )
    r = http_text(http).collect()[0]
    assert (r["http_status"], r["charset"], r["text"]) == \
        (200, "windows-1252", "“q”")


def test_ivf_fixed_codebook_assignment_and_probe(spark):
    """ivf_topk_fixed (r14): nearest-centroid assignment with ties to
    the LOWEST cell id, n_probe cell fan-out, exact top-k within the
    probed cells only."""
    from parquet_on_fhir_spark.operators.similarity import ivf_topk_fixed

    cents = [[1.0, 0.0], [0.0, 1.0]]
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.1]), (2, [0.9, 0.2]), (3, [0.1, 1.0]),
         (4, [0.2, 0.9]), (5, [0.5, 0.5])],  # 5 is equidistant -> cell 0
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0])], "q_id long, embedding array<double>"
    )
    got1 = {r["vec_id"] for r in ivf_topk_fixed(
        corpus, queries, cents, k=5, n_probe=1).collect()}
    assert got1 == {1, 2, 5}  # cell-0 members only, incl. the tie
    got2 = {r["vec_id"] for r in ivf_topk_fixed(
        corpus, queries, cents, k=5, n_probe=2).collect()}
    assert got2 == {1, 2, 3, 4, 5}
    # ranking inside the probed cell is exact cosine order
    ranks = {r["vec_id"]: r["rank"] for r in ivf_topk_fixed(
        corpus, queries, cents, k=5, n_probe=1).collect()}
    assert ranks[1] == 1 and ranks[2] == 2 and ranks[5] == 3


def test_c4_filter_rule_truth_table(spark):
    """C4 cleaning rules (r14 wave 3): line gates (terminal punct,
    >=3 words, no-javascript) and page gates (blocklist > lorem >
    brace > sentences) with first-reason precedence."""
    from parquet_on_fhir_spark.operators.curation import c4_filter

    five = ("One fine sentence right here.\nSecond sentence also here ok."
            "\nThird one is here as well.\nFourth sentence lands here too."
            "\nFifth sentence completes it now.")
    docs = spark.createDataFrame(
        [(1, five),
         (2, five + "\nno terminal punct line\nshort one.\n"
                     "Enable javascript to proceed."),
         (3, five + "\nlorem ipsum dolor sit."),
         (4, five + "\ncode { brace }."),
         (5, five + "\nthis has badword1 in it."),
         (6, "Too. Few. Sentences here.")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            c4_filter(docs, blocklist=("badword1",)).collect()}
    assert rows[1]["kept"] is True and rows[1]["reason"] is None
    assert rows[1]["n_kept_lines"] == 5 and rows[1]["n_sentences"] == 5
    # doc 2: three bad lines dropped (no punct; <3 words; javascript),
    # page still kept (5 clean sentences survive)
    assert rows[2]["n_lines"] == 8 and rows[2]["n_kept_lines"] == 5
    assert rows[2]["kept"] is True
    assert rows[3]["reason"] == "lorem_ipsum"
    assert rows[4]["reason"] == "brace"
    assert rows[5]["reason"] == "blocklist"
    assert rows[6]["reason"] == "too_few_sentences"
    assert not rows[6]["kept"]
    # precedence: blocklist beats brace on a doc with both
    both = spark.createDataFrame(
        [(7, five + "\nbadword1 { both }.")], "doc_id long, text string")
    assert c4_filter(both, blocklist=("badword1",)).collect()[0][
        "reason"] == "blocklist"


def test_binary_hamming_codes_and_rerank(spark):
    """Binary quantization (r14 wave 3): sign codes pack into two
    32-bit halves, Hamming counts differing signs, a loose threshold
    reproduces brute force exactly, a tight one prunes."""
    from parquet_on_fhir_spark.operators.similarity import (
        binary_codes,
        binary_hamming_topk,
        brute_force_topk,
    )

    # code packing: dims 0 and 33 positive -> lo bit0, hi bit1
    df = spark.createDataFrame(
        [([1.0] + [-1.0] * 32 + [1.0] + [-1.0] * 30,)],
        "embedding array<double>",
    )
    lo, hi = binary_codes(F.col("embedding"), 64)
    r = df.select(lo.alias("lo"), hi.alias("hi")).collect()[0]
    assert (r["lo"], r["hi"]) == (1, 2)

    from parquet_on_fhir_spark.api import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding")
    loose = binary_hamming_topk(e, q, k=4, max_hamming=64).select(
        "q_id", "vec_id", "rank")
    exact = brute_force_topk(e, q, k=4).select("q_id", "vec_id", "rank")
    assert loose.exceptAll(exact).count() == 0
    assert exact.exceptAll(loose).count() == 0
    # tight threshold prunes candidates but keeps them a subset
    tight = binary_hamming_topk(e, q, k=4, max_hamming=8)
    assert tight.count() <= loose.count()
    assert tight.filter(F.col("hamming") > 8).count() == 0


def test_mojibake_repair_cases(spark):
    """fix_mojibake (r14 wave 4): exact reversal of single/double
    UTF-8-as-latin1 mis-decoding, refusal on invalid round trips,
    cp1252-hole fallback, NULL passthrough."""
    from parquet_on_fhir_spark.operators.encoding import (
        fix_mojibake,
        fix_mojibake_text,
    )

    clean = "café naïve — “ok”"
    once = clean.encode("utf-8").decode("latin-1")
    twice = once.encode("utf-8").decode("latin-1")
    assert fix_mojibake_text(once) == (clean, 1)
    assert fix_mojibake_text(twice) == (clean, 2)
    assert fix_mojibake_text(clean) == (clean, 0)
    assert fix_mojibake_text("x Ã y") == ("x Ã y", 0)  # invalid utf-8
    assert fix_mojibake_text("plain ascii.") == ("plain ascii.", 0)
    # repair must never run on text it can't round-trip (CJK etc.)
    assert fix_mojibake_text("日本語テキスト") == ("日本語テキスト", 0)

    docs = spark.createDataFrame(
        [(1, once), (2, clean), (3, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in fix_mojibake(docs).collect()}
    assert rows[1]["text"] == clean and rows[1]["fixed"] is True
    assert rows[2]["fixed"] is False and rows[2]["n_passes"] == 0
    assert rows[3]["text"] is None and rows[3]["n_passes"] is None


def test_parse_sitemap_shapes(spark):
    """parse_sitemap (r14 wave 4): urlset vs sitemapindex detection,
    optional lastmod, whitespace-tolerant loc, loc-less entries
    dropped, empty documents emit nothing."""
    from parquet_on_fhir_spark.operators.robots import parse_sitemap

    sm = spark.createDataFrame(
        [("a.ex", "<urlset><url><loc>https://a.ex/1</loc>"
                  "<lastmod>2026-03-04</lastmod></url>"
                  "<url><loc>  https://a.ex/2 </loc></url>"
                  "<url><lastmod>2026-03-05</lastmod></url></urlset>"),
         ("b.ex", "<sitemapindex><sitemap><loc>https://b.ex/c.xml</loc>"
                  "</sitemap></sitemapindex>"),
         ("c.ex", "<urlset></urlset>")],
        "host string, sitemap_xml string",
    )
    rows = [(r["host"], r["kind"], r["seq"], r["loc"], r["lastmod"])
            for r in parse_sitemap(sm).orderBy("host", "seq").collect()]
    assert rows == [
        ("a.ex", "urlset", 0, "https://a.ex/1", "2026-03-04"),
        ("a.ex", "urlset", 1, "https://a.ex/2", None),
        ("b.ex", "index", 0, "https://b.ex/c.xml", None),
    ]


def test_c4_filter_null_text_fails_gate(spark):
    """r14 advice: NULL text must fail the page gate deterministically
    (reason=null_text, kept=False) — before the fix every page-gate
    predicate evaluated NULL and the page passed with kept=True."""
    from parquet_on_fhir_spark.operators.curation import c4_filter

    docs = spark.createDataFrame(
        [(1, None),
         (2, "One fine sentence right here.\nSecond sentence also ok."
             "\nThird one is here as well.\nFourth sentence lands too."
             "\nFifth sentence completes it now.")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_filter(docs).collect()}
    assert rows[1]["reason"] == "null_text"
    assert rows[1]["kept"] is False
    assert rows[2]["kept"] is True and rows[2]["reason"] is None


def test_robots_octet_length_precedence(spark):
    """RFC 9309 defines longest-match over OCTETS (r14 advice): on
    path /caféé the 6-char/8-octet Disallow /caféé must outrank the
    6-char/7-octet Allow /café* — a character-count comparison ties
    them and wrongly lets Allow win. Twin and Catalyst fold must
    agree on the spec answer."""
    from parquet_on_fhir_spark.operators.robots import (
        parse_robots,
        robots_allowed,
        robots_filter,
    )

    txt = "User-agent: *\nDisallow: /caféé\nAllow: /café*\n"
    rules = parse_robots(txt, "anybot")
    assert robots_allowed(rules, "/caféé") is False  # 8 > 7 octets
    assert robots_allowed(rules, "/caféx") is True        # only Allow matches

    robots = spark.createDataFrame(
        [("u.ex", txt)], "host string, robots_txt string")
    urls = spark.createDataFrame(
        [(1, "u.ex", "https://u.ex/caféé"),
         (2, "u.ex", "https://u.ex/caféx")],
        "id long, host string, url string",
    )
    got = {r["id"]: r["allowed"] for r in
           robots_filter(urls, robots).collect()}
    assert got == {1: False, 2: True}


def test_warc_revisit_records_and_resolve(spark):
    """WARC revisit chain (r15, ISO 28500 §6.7.2): the digest/refers
    headers parse through warc_records, and revisit_resolve joins
    each revisit to the canonical (earliest date, then uri) original
    across archives; dangling digests resolve to original_found=False
    with bytes_saved=0."""
    from parquet_on_fhir_spark.operators.warc import (
        build_warc,
        parse_warc,
        revisit_resolve,
        warc_records,
    )

    body = b"HTTP/1.1 200 OK\r\n\r\nhello world"
    w1 = build_warc([
        ("response", "https://a.ex/p", "2026-01-01T00:00:00Z", body,
         {"WARC-Payload-Digest": "sha1:AAA",
          "WARC-Record-ID": "<urn:uuid:1>"}),
        ("response", "https://a.ex/dup", "2026-01-02T00:00:00Z", body,
         {"WARC-Payload-Digest": "sha1:AAA"}),
    ])
    w2 = build_warc([
        ("revisit", "https://a.ex/p", "2026-02-01T00:00:00Z", b"",
         {"WARC-Payload-Digest": "sha1:AAA",
          "WARC-Refers-To-Target-URI": "https://a.ex/p",
          "WARC-Profile": "http://netpreserve.org/warc/1.1/revisit/"
                          "identical-payload-digest"}),
        ("revisit", "https://a.ex/q", "2026-02-01T00:00:01Z", b"",
         {"WARC-Payload-Digest": "sha1:GONE"}),
    ], gzip_members=True)

    recs = parse_warc(w2)
    assert recs[0]["rec_type"] == "revisit"
    assert recs[0]["payload_digest"] == "sha1:AAA"
    assert recs[0]["refers_to_uri"] == "https://a.ex/p"
    assert recs[0]["profile"].endswith("identical-payload-digest")
    assert parse_warc(w1)[0]["record_id"] == "<urn:uuid:1>"

    media = spark.createDataFrame(
        [(1, bytearray(w1)), (2, bytearray(w2))],
        "media_id long, content binary",
    )
    frame = warc_records(media)
    assert {r["payload_digest"] for r in frame.collect()} == {
        "sha1:AAA", "sha1:GONE"}
    out = {r["revisit_uri"]: r for r in revisit_resolve(frame).collect()}
    assert len(out) == 2
    ok = out["https://a.ex/p"]
    # earliest-date original wins, not the same-digest later dup
    assert ok["original_uri"] == "https://a.ex/p"
    assert ok["original_date"] == "2026-01-01T00:00:00Z"
    assert ok["original_found"] is True
    assert ok["bytes_saved"] == len(body)
    gone = out["https://a.ex/q"]
    assert gone["original_found"] is False
    assert gone["original_uri"] is None and gone["bytes_saved"] == 0
    # forced distribution modes agree
    for mode in ("broadcast", "shuffle"):
        got = {r["revisit_uri"]: r["original_found"] for r in
               revisit_resolve(frame, distribute=mode).collect()}
        assert got == {"https://a.ex/p": True, "https://a.ex/q": False}


def test_warc_build_parse_roundtrip_property():
    """Differential round trip (r15): build_warc(specs) -> parse_warc
    must return every record's type/uri/date/length and the full
    revisit-chain header set verbatim, plain and member-gzipped, for
    random spec lists — the writer and parser are independent code
    paths over the ISO 28500 grammar."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_on_fhir_spark.operators.warc import build_warc, parse_warc

    token = st.text(alphabet="abcdefgh0123456789:/._-", min_size=1,
                    max_size=20)
    payload = st.binary(max_size=60).filter(
        lambda b: b[:5] != b"HTTP/")
    spec = st.tuples(
        st.sampled_from(["response", "request", "revisit", "warcinfo",
                         "metadata"]),
        st.one_of(st.none(), token.map(lambda t: "https://" + t)),
        st.one_of(st.none(), st.just("2026-08-17T00:00:00Z")),
        payload,
        st.fixed_dictionaries(
            {},
            optional={
                "WARC-Payload-Digest": token.map(lambda t: "sha1:" + t),
                "WARC-Refers-To-Target-URI": token,
                "WARC-Profile": token,
                "WARC-Record-ID": token,
            },
        ),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(spec, max_size=5), st.booleans())
    def check(specs, gz):
        out = parse_warc(build_warc(specs, gzip_members=gz))
        assert len(out) == len(specs)
        for rec, (rt, uri, date, body, extra) in zip(out, specs):
            assert rec["rec_type"] == rt
            assert rec["target_uri"] == uri
            assert rec["date"] == date
            assert rec["content_length"] == len(body)
            assert rec["payload_prefix"] == body
            assert rec["payload_digest"] == extra.get("WARC-Payload-Digest")
            assert rec["refers_to_uri"] == extra.get(
                "WARC-Refers-To-Target-URI")
            assert rec["profile"] == extra.get("WARC-Profile")
            assert rec["record_id"] == extra.get("WARC-Record-ID")

    check()
