"""as-of / interval join operator tests (vs naive formulations)."""

import pytest
from pyspark.sql import functions as F

from parquet_on_fhir_spark.api import load_table
from parquet_on_fhir_spark.operators.joins import (
    as_of_join,
    bucketed_interval_join,
    interval_overlap_join,
)


def test_as_of_join_matches_naive(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    got = as_of_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["event_id"], tiebreak="event_id",
    ).select("event_id", "asof_event_id")

    naive = (
        purchases.alias("p")
        .join(
            views.alias("v"),
            (F.col("p.user_id") == F.col("v.user_id")) & (F.col("v.ts") <= F.col("p.ts")),
            "left",
        )
        .groupBy(F.col("p.event_id").alias("event_id"))
        .agg(F.max_by("v.event_id", F.struct("v.ts", "v.event_id")).alias("expect"))
    )
    diff = (
        got.join(naive, "event_id")
        .filter(
            F.coalesce(F.col("asof_event_id"), F.lit(-1))
            != F.coalesce(F.col("expect"), F.lit(-1))
        )
        .count()
    )
    assert diff == 0
    assert got.count() == purchases.count()  # left-preserving


def test_as_of_tolerance(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    tol = as_of_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["event_id"], tolerance="1 HOUR", tiebreak="event_id",
    )
    # every surviving match is within the tolerance window
    bad = tol.filter(
        F.col("asof_ts") < F.col("ts") - F.expr("INTERVAL 1 HOUR")
    ).count()
    assert bad == 0
    no_tol = as_of_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["event_id"], tiebreak="event_id",
    )
    assert tol.filter(F.col("asof_ts").isNotNull()).count() <= no_tol.filter(
        F.col("asof_ts").isNotNull()
    ).count()


def test_interval_join_and_bucketed_agree(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("l_id"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("l_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("l_end"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_start"),
        F.col("ts").alias("r_end"),
    )
    bucketed = bucketed_interval_join(
        errors, clicks, "l_start", "l_end", "r_start", "r_end", bucket="1 hour"
    ).select("l_id", "r_id")
    naive = errors.join(
        clicks,
        (errors["l_start"] <= clicks["r_end"]) & (clicks["r_start"] <= errors["l_end"]),
    ).select("l_id", "r_id")
    assert bucketed.exceptAll(naive).count() == 0
    assert naive.exceptAll(bucketed).count() == 0


def test_interval_overlap_join_keyed(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "error").select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("a_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("a_end"),
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts").alias("b_start"),
        F.col("ts").alias("b_end"),
    )
    res = interval_overlap_join(
        a, b, on=["user_id"], left_start="a_start", left_end="a_end",
        right_start="b_start", right_end="b_end",
    )
    rows = res.limit(50).collect()
    for r in rows:
        assert r["a_start"] <= r["b_end"] and r["b_start"] <= r["a_end"]


def test_as_of_join_preserves_annotation_columns(spark):
    """A left table carrying this format's own __annotation columns (or a
    literal __ts) must pass through the as-of join untouched (ADVICE r1)."""
    left = spark.createDataFrame(
        [("k1", "2024-01-01 10:00:00", "2024-01-01", "keepme")],
        "k string, t string, __t_start string, __ts string",
    )
    right = spark.createDataFrame(
        [("k1", "2024-01-01 09:00:00", 5.0)], "k string, rt string, v double"
    )
    out = as_of_join(left, right, on=["k"], left_ts="t", right_ts="rt",
                     right_cols=["v"])
    r = out.collect()[0]
    assert r["__t_start"] == "2024-01-01" and r["__ts"] == "keepme"
    assert r["asof_v"] == 5.0
    assert set(out.columns) == {"k", "t", "__t_start", "__ts", "asof_ts", "asof_v"}


def test_bucketed_interval_join_multiplicity(spark):
    """Legitimately duplicate input rows must produce duplicate matched
    pairs (join multiplicity), while multi-bucket double-matches still
    collapse (ADVICE r1)."""
    left = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", "2024-01-03 00:00:00")] * 2,  # dup row
        "lv string, s string, e string",
    ).select("lv", F.col("s").cast("timestamp"), F.col("e").cast("timestamp"))
    right = spark.createDataFrame(
        [("b", "2024-01-02 00:00:00", "2024-01-02 12:00:00")],
        "rv string, rs string, re string",
    ).select("rv", F.col("rs").cast("timestamp"), F.col("re").cast("timestamp"))
    out = bucketed_interval_join(
        left, right, "s", "e", "rs", "re", bucket="1 day"
    )
    # 2 identical left rows × 1 right row → exactly 2 pairs (the 3-day ×
    # 1-day bucket overlap would give up to 2 bucket hits per pair)
    assert out.count() == 2


@pytest.mark.slow
def test_fuzzy_join_matches_exact_quadratic(spark):
    """FastSS blocking is sound AND complete: the pair set equals the
    brute-force levenshtein join for k=1 and k=2."""
    from pyspark.sql import functions as F

    from parquet_on_fhir_spark.operators.joins import fuzzy_join

    names = ["smith", "smyth", "smithe", "jones", "jonez", "brown",
             "browne", "braun", "x", "", "xy"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "id long, s string"
    )
    for k in (1, 2):
        got = {
            (r.id_l, r.id_r, r.dist)
            for r in fuzzy_join(df, df, "s", "s", max_dist=k, left_id="id",
                                right_id="id")
            .filter(F.col("id_l") < F.col("id_r"))
            .selectExpr("id_l", "id_r", "dist")
            .collect()
        }
        brute = {
            (r.a, r.b, r.d)
            for r in df.alias("x")
            .crossJoin(df.alias("y"))
            .select(
                F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                F.levenshtein("x.s", "y.s").alias("d"),
            )
            .filter((F.col("a") < F.col("b")) & (F.col("d") <= k))
            .collect()
        }
        assert got == brute, (k, got ^ brute)


def test_fuzzy_join_rejects_large_k(spark):
    import pytest

    from parquet_on_fhir_spark.operators.joins import fuzzy_join

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError):
        fuzzy_join(df, df, "s", "s", max_dist=3)


@pytest.mark.slow
def test_fuzzy_join_randomized_vs_brute_force(spark):
    """Seeded random corpus (mixed alphabet, lengths 0-8, duplicates):
    FastSS candidate generation misses no pair at k=1 and k=2."""
    import random

    from pyspark.sql import functions as F

    from parquet_on_fhir_spark.operators.joins import fuzzy_join

    rng = random.Random(20240814)
    alphabet = "abcXYZ01"
    strings = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "id long, s string"
    )
    for k in (1, 2):
        got = {
            (r.id_l, r.id_r)
            for r in fuzzy_join(df, df, "s", "s", max_dist=k,
                                left_id="id", right_id="id")
            .filter(F.col("id_l") < F.col("id_r"))
            .collect()
        }
        brute = {
            (r.a, r.b)
            for r in df.alias("x").crossJoin(df.alias("y"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                    F.levenshtein("x.s", "y.s").alias("d"))
            .filter((F.col("a") < F.col("b")) & (F.col("d") <= k))
            .collect()
        }
        assert got == brute, (k, len(got), len(brute))


def test_set_similarity_join_matches_bruteforce(spark):
    """Prefix-filtered exact Jaccard join == brute-force pairs on a
    crafted corpus with shared frequent tokens (the case that forces
    the prefix filter to earn its keep)."""
    from itertools import combinations

    from parquet_on_fhir_spark.operators.joins import set_similarity_join

    sets = {
        1: ["the", "a", "x1", "x2", "x3"],
        2: ["the", "a", "x1", "x2", "x4"],   # jac(1,2)=4/6=0.667
        3: ["the", "a", "x1", "x2", "x3"],   # identical to 1
        4: ["the", "a", "y1", "y2", "y3"],   # only frequent overlap
        5: ["z1"],
        6: ["z1"],                            # jac=1.0 singleton pair
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in sets.items()], "id long, toks array<string>"
    )
    for t in (0.5, 0.66, 0.9):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in set_similarity_join(df, "id", "toks", t).collect()
        }
        expect = {}
        for a, b in combinations(sorted(sets), 2):
            sa, sb = set(sets[a]), set(sets[b])
            j = len(sa & sb) / len(sa | sb)
            if j >= t:
                expect[(a, b)] = j
        assert set(got) == set(expect), f"t={t}"
        for k, v in expect.items():
            assert abs(got[k] - v) < 1e-12


def test_set_similarity_candidate_budget_guard(spark):
    """The r9 pre-flight guard: a template-vocabulary corpus (every row
    drawing from one small shared vocabulary — the regime SCALE_NOTES
    measured at 52% of all-pairs on the synthetic documents table)
    must RAISE before the candidate join goes quadratic; a Zipfian
    corpus with rare discriminative tokens must pass; and
    candidate_budget=None must accept the degenerate corpus and still
    return exact results."""
    import pytest

    from parquet_on_fhir_spark.operators.joins import set_similarity_join

    # template regime: 2000 docs, every token set drawn from the same
    # 8-word vocabulary -> prefixes collide everywhere.  At t=0.8 the
    # 2-token prefixes spread 4000 rows over 8 tokens (df~500), so the
    # bound ~ 8*C(500,2) ~ 1e6 pairs = ~50% of C(2000,2) — over both
    # the 25% ratio and the 1e5 absolute floor.
    vocab = [f"w{i}" for i in range(8)]
    template = spark.createDataFrame(
        [(i, [vocab[(i + k) % 8] for k in range(5)]) for i in range(2000)],
        "id long, toks array<string>",
    )
    with pytest.raises(ValueError, match="candidate budget exceeded"):
        set_similarity_join(template, "id", "toks", 0.8)

    # opt-out still computes, exactly: pairs with the same i%8 carry
    # identical sets -> jaccard 1.0, 8 classes of 250 ids each
    got = set_similarity_join(
        template, "id", "toks", 0.99, candidate_budget=None
    )
    assert got.filter("jaccard < 1.0").count() == 0
    assert got.count() == 8 * (250 * 249 // 2)

    # Zipfian regime at the same n: each doc carries unique rare
    # tokens + a couple of frequent ones -> prefix dfs stay tiny,
    # guard passes (est ~ 0 pairs)
    zipf = spark.createDataFrame(
        [
            (i, ["the", "a", f"r{i}_1", f"r{i}_2", f"r{i}_3", f"r{i}_4"])
            for i in range(2000)
        ],
        "id long, toks array<string>",
    )
    assert set_similarity_join(zipf, "id", "toks", 0.8).count() == 0


def test_set_similarity_join_rejects_bad_threshold(spark):
    import pytest

    from parquet_on_fhir_spark.operators.joins import set_similarity_join

    df = spark.createDataFrame([(1, ["a"])], "id long, toks array<string>")
    with pytest.raises(ValueError, match="threshold"):
        set_similarity_join(df, "id", "toks", 0.0)


def test_bloom_semi_join_exact_and_prefilter(spark):
    """operators/joins.py::bloom_semi_join (r12): results are EXACTLY
    the plain left-semi join (false positives die in the exact join,
    false negatives are impossible), NULL keys never match, and the
    Bloom prefilter alone keeps every true match while passing only a
    bounded false-positive fraction of non-matches."""
    from pyspark.sql import functions as F

    from parquet_on_fhir_spark.operators.joins import bloom_semi_join

    fact = spark.range(0, 20000).select(
        F.when(F.col("id") % 997 == 0, None)
        .otherwise(F.col("id"))
        .alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    dim = spark.range(0, 20000, 13).select(F.col("id").alias("dk"))
    got = bloom_semi_join(fact, dim, "k", "dk", m_bits=1 << 16)
    exact = fact.join(
        dim.withColumnRenamed("dk", "k"), "k", "left_semi"
    )
    assert got.count() == exact.count()
    assert (
        got.agg(F.sum("v")).first()[0] == exact.agg(F.sum("v")).first()[0]
    )
    # NULL fact keys never survive
    assert got.filter(F.col("k").isNull()).count() == 0

    # prefilter-only behavior: rebuild the probe condition by running
    # the operator against an EMPTY exact side is not possible, so
    # check the bound indirectly — with a tiny bitmap the exact join
    # still yields exact results (saturated bloom = no false negatives)
    tiny = bloom_semi_join(fact, dim, "k", "dk", m_bits=64, n_hashes=2)
    assert tiny.count() == exact.count()

    import pytest

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_semi_join(fact, dim, "k", "dk", m_bits=100)


@pytest.mark.slow
def test_fs_em_fit_matches_numpy_reference(spark):
    """fs_em_fit (distributed EM) vs an independent numpy EM, element
    by element after every iteration count tried; planted m/u are
    recovered; parameter/emptiness guards."""
    import random

    import numpy as np
    import pytest

    from parquet_on_fhir_spark.operators.joins import fs_em_fit

    rng = random.Random(7)
    rows = []
    for _ in range(200):
        rows.append(tuple(rng.random() < m for m in (0.9, 0.85, 0.8)))
    for _ in range(1800):
        rows.append(tuple(rng.random() < u for u in (0.1, 0.2, 0.05)))
    df = spark.createDataFrame(rows, ["f1", "f2", "f3"])

    def numpy_em(iters):
        g = np.array(rows, dtype=float)
        p, m, u = 0.1, np.full(3, 0.9), np.full(3, 0.1)
        for _ in range(iters):
            lm = np.log(p) + (g * np.log(m) + (1 - g) * np.log(1 - m)).sum(1)
            lu = np.log(1 - p) + (
                g * np.log(u) + (1 - g) * np.log(1 - u)
            ).sum(1)
            w = 1 / (1 + np.exp(lu - lm))
            p = min(max(w.mean(), 1e-6), 1 - 1e-6)
            m = np.clip((w[:, None] * g).sum(0) / w.sum(), 1e-6, 1 - 1e-6)
            u = np.clip(
                ((1 - w)[:, None] * g).sum(0) / (1 - w).sum(), 1e-6, 1 - 1e-6
            )
        return p, m, u

    for iters in (1, 5, 15):
        fit = fs_em_fit(df, ["f1", "f2", "f3"], iterations=iters)
        p_ref, m_ref, u_ref = numpy_em(iters)
        got = {c: (m, u) for c, m, u in fit}
        assert abs(got["__prevalence__"][0] - p_ref) < 1e-9
        for i, c in enumerate(("f1", "f2", "f3")):
            assert abs(got[c][0] - m_ref[i]) < 1e-9, (iters, c)
            assert abs(got[c][1] - u_ref[i]) < 1e-9, (iters, c)
    # planted params recovered within a few points at 15 iters
    got = {c: (m, u) for c, m, u in fs_em_fit(df, ["f1", "f2", "f3"], 15)}
    assert abs(got["f1"][0] - 0.9) < 0.05 and abs(got["f1"][1] - 0.1) < 0.05

    with pytest.raises(ValueError, match="iterations"):
        fs_em_fit(df, ["f1"], iterations=0)
    with pytest.raises(ValueError, match="agreement"):
        fs_em_fit(df, [], iterations=1)


def test_fs_link_score_weights_and_classes(spark):
    import math

    import pytest

    from parquet_on_fhir_spark.operators.joins import fs_link_score

    params = {"name_eq": (0.9, 0.01), "seg_eq": (0.8, 0.2)}
    rows = [(True, True), (True, False), (False, True),
            (False, False), (None, True)]
    df = spark.createDataFrame(rows, ["name_eq", "seg_eq"])
    got = fs_link_score(df, params, upper=3.0, lower=-3.0).collect()
    w_name_a = round(math.log2(0.9 / 0.01), 12)
    w_name_d = round(math.log2(0.1 / 0.99), 12)
    w_seg_a = round(math.log2(0.8 / 0.2), 12)
    w_seg_d = round(math.log2(0.2 / 0.8), 12)
    want = [
        (round(w_name_a + w_seg_a, 12), "match"),      # 6.49 + 2
        (round(w_name_a + w_seg_d, 12), "match"),      # 6.49 - 2
        (round(w_name_d + w_seg_a, 12), "possible"),   # -3.31 + 2: clerical band
        (round(w_name_d + w_seg_d, 12), "non_match"),  # -3.31 - 2
        (round(w_name_d + w_seg_a, 12), "possible"),   # NULL = disagree
    ]
    for r, (score, cls) in zip(got, want):
        assert r["fs_score"] == score
        assert r["match_class"] == cls

    with pytest.raises(ValueError, match="0 < u < m"):
        fs_link_score(df, {"name_eq": (0.1, 0.9)})
