"""Round-12 wave-2 operators: degree assortativity, mergeable
histogram-sketch quantiles, Kendall tau-b (Knight's algorithm)."""

from __future__ import annotations

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from parquet_on_fhir_spark.operators.analytics import (
    _strict_inversions,
    histogram_quantile_sketch,
    kendall_tau,
)
from parquet_on_fhir_spark.operators.graph import degree_assortativity


# --- degree assortativity -----------------------------------------------------------


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return (n * sxy - sx * sy) / math.sqrt(vx * vy)


def test_assortativity_directed_matches_reference(spark):
    edges = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10), (4, 13)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = degree_assortativity(df, directed=True).collect()[0]
    out_deg = {u: sum(1 for a, _ in edges if a == u) for u, _ in edges}
    in_deg = {v: sum(1 for _, b in edges if b == v) for _, v in edges}
    xs = [out_deg[u] for u, _ in edges]
    ys = [in_deg[v] for _, v in edges]
    assert row["n_edges"] == len(edges)
    assert row["mean_src_deg"] == pytest.approx(sum(xs) / len(xs))
    assert row["assortativity"] == pytest.approx(_pearson(xs, ys), abs=1e-12)


def test_assortativity_directed_dedups_edges(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 11)], "src long, dst long"
    )
    row = degree_assortativity(df, directed=True).collect()[0]
    assert row["n_edges"] == 2


def test_assortativity_undirected_symmetric_and_signed(spark):
    # star graph: hub degree 3 vs leaf degree 1 -> perfectly
    # disassortative, r = -1
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    row = degree_assortativity(df, directed=False).collect()[0]
    assert row["n_edges"] == 6  # both orientations of 3 edges
    assert row["assortativity"] == pytest.approx(-1.0, abs=1e-12)
    # flipping edge direction must not change the undirected coefficient
    flipped = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "src long, dst long"
    )
    row2 = degree_assortativity(flipped, directed=False).collect()[0]
    assert row2["assortativity"] == pytest.approx(
        row["assortativity"], abs=1e-15
    )


def test_assortativity_zero_variance_is_null(spark):
    # perfect matching: every degree is 1 -> no variance -> NULL
    df = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    row = degree_assortativity(df, directed=False).collect()[0]
    assert row["assortativity"] is None


# --- histogram-sketch quantiles ------------------------------------------------------


def test_histogram_sketch_exact_on_bin_centers(spark):
    # values placed so every bin holds a known count; with lo=0, hi=100,
    # bins=100 each integer value v lands in bin v
    rows = [("a", float(v)) for v in range(100)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = histogram_quantile_sketch(
        df, "v", ["g"], lo=0.0, hi=100.0, bins=100,
        quantiles=(0.5,), with_global=False,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 100
    # rank ceil(0.5*100)=50 -> bin 49 (cum 50), interpolate to its end
    assert r["estimate"] == pytest.approx(50.0, abs=1e-9)


def test_histogram_sketch_clamps_out_of_domain(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 500.0), ("a", 50.0)], "g string, v double"
    )
    out = histogram_quantile_sketch(
        df, "v", ["g"], lo=0.0, hi=100.0, bins=10,
        quantiles=(0.5,), with_global=False,
    ).collect()[0]
    assert out["n"] == 3  # clamped rows still counted


def test_histogram_sketch_global_row_is_sketch_merge(spark):
    rows = [("a", float(v)) for v in range(50)] + [
        ("b", float(v)) for v in range(50, 100)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["grp"], r["q"]): r
        for r in histogram_quantile_sketch(
            df, "v", ["g"], lo=0.0, hi=100.0, bins=100,
            quantiles=(0.5, 0.9),
        ).collect()
    }
    # the ALL row must equal the sketch computed over the union directly
    direct = {
        r["q"]: r
        for r in histogram_quantile_sketch(
            df.withColumn("g", F.lit("one")), "v", ["g"],
            lo=0.0, hi=100.0, bins=100, quantiles=(0.5, 0.9),
            with_global=False,
        ).collect()
    }
    for q in (0.5, 0.9):
        assert out[("ALL", q)]["n"] == direct[q]["n"]
        assert out[("ALL", q)]["estimate"] == pytest.approx(
            direct[q]["estimate"], abs=1e-12
        )


def test_histogram_sketch_requires_groups(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        histogram_quantile_sketch(df, "v", [], lo=0.0, hi=1.0)


# --- Kendall tau-b --------------------------------------------------------------------


def _brute_inversions(y):
    return sum(
        1 for i, j in itertools.combinations(range(len(y)), 2) if y[i] > y[j]
    )


def test_strict_inversions_vs_brute():
    rng = random.Random(12)
    for n in (0, 1, 2, 7, 40, 101):
        y = [rng.randrange(8) for _ in range(n)]
        assert _strict_inversions(y) == _brute_inversions(y)


def _brute_tau_b(pairs):
    n = len(pairs)
    nc = nd = n1 = n2 = n3 = 0
    for (x1, y1), (x2, y2) in itertools.combinations(pairs, 2):
        if x1 == x2:
            n1 += 1
        if y1 == y2:
            n2 += 1
        if x1 == x2 and y1 == y2:
            n3 += 1
        if (x1 < x2 and y1 < y2) or (x1 > x2 and y1 > y2):
            nc += 1
        if (x1 < x2 and y1 > y2) or (x1 > x2 and y1 < y2):
            nd += 1
    n0 = n * (n - 1) // 2
    denom = (n0 - n1) * (n0 - n2)
    tau = (nc - nd) / math.sqrt(denom) if denom > 0 else None
    return nc, nd, n1, n2, n3, tau


def test_kendall_tau_matches_brute_force_with_ties(spark):
    rng = random.Random(34)
    rows = [
        ("g1", rng.randrange(5), rng.randrange(5)) for _ in range(60)
    ] + [("g2", i, i) for i in range(10)] + [("g3", 1, v) for v in range(5)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: r
        for r in kendall_tau(df, "x", "y", ["g"]).collect()
    }
    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, pairs in by_g.items():
        nc, nd, n1, n2, n3, tau = _brute_tau_b(pairs)
        r = got[g]
        assert (
            r["concordant"], r["discordant"], r["tied_x"], r["tied_y"],
            r["tied_both"],
        ) == (nc, nd, n1, n2, n3), g
        if tau is None:
            assert r["tau_b"] is None
        else:
            assert r["tau_b"] == pytest.approx(tau, abs=1e-12)
    # g2 is a perfect monotone sequence; g3 has zero x-variance
    assert got["g2"]["tau_b"] == pytest.approx(1.0)
    assert got["g3"]["tau_b"] is None


def test_kendall_tau_drops_null_rows(spark):
    df = spark.createDataFrame(
        [("g", 1, 1), ("g", None, 2), ("g", 2, None), ("g", 3, 3)],
        "g string, x int, y int",
    )
    r = kendall_tau(df, "x", "y", ["g"]).collect()[0]
    assert r["n"] == 2
    assert r["tau_b"] == pytest.approx(1.0)
