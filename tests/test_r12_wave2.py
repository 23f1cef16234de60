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


# --- GIF codec ------------------------------------------------------------------------

import base64
import datetime

import numpy as np

from parquet_on_fhir_spark.operators.multimodal import (
    decode_gif,
    decode_pixels,
    encode_gif,
)
from parquet_on_fhir_spark.operators.timeseries import cross_correlation

TINY_GIF = base64.b64decode(
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


@pytest.mark.parametrize(
    "shape,ncol,inter",
    [
        ((8, 8), 2, False),
        ((13, 7), 5, True),
        ((100, 100), 8, False),  # >4096 LZW entries: exercises the reset
        ((100, 100), 8, True),
        ((1, 1), 1, False),
        ((33, 1), 3, True),
        ((3, 257), 250, False),
    ],
)
def test_gif_round_trip(shape, ncol, inter):
    rng = np.random.default_rng(shape[0] * 1000 + ncol)
    pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, size=shape)]
    w, h, out = decode_gif(encode_gif(img, interlace=inter))
    assert (w, h) == (shape[1], shape[0])
    assert np.array_equal(out, img)


def test_gif_external_minimal_file():
    # the canonical 43-byte 1x1 transparent GIF89a: GCE extension block
    # to skip, EOI omitted (pixel-count termination), black palette 0
    w, h, img = decode_gif(TINY_GIF)
    assert (w, h) == (1, 1)
    assert img.tolist() == [[[0, 0, 0]]]


def test_gif_dispatches_from_decode_pixels():
    img = np.full((4, 4, 3), 77, dtype=np.uint8)
    w, h, out = decode_pixels(encode_gif(img))
    assert (w, h) == (4, 4) and np.array_equal(out, img)


def test_gif_interlace_bit_changes_row_order():
    # flipping the stored interlace flag must scramble a split image —
    # proves the 4-pass reorder is real, not an identity
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[4:] = 200
    data = bytearray(encode_gif(img, interlace=True))
    # image descriptor: 6 header + 7 LSD + 3*2 palette -> 0x2C at 19
    assert data[19] == 0x2C
    assert data[28] == 0x40
    data[28] = 0  # clear the interlace flag
    _, _, scrambled = decode_gif(bytes(data))
    assert not np.array_equal(scrambled, img)


def test_gif_local_color_table_wins():
    img = np.array([[[10, 20, 30], [200, 210, 220]]], dtype=np.uint8)
    data = bytearray(encode_gif(img))
    # surgically rewrite: GCT (2 entries, 6 bytes at 13..19) becomes an
    # LCT after the image descriptor; LSD loses its GCT flag
    palette = bytes(data[13:19])
    rest = bytes(data[19:])
    assert rest[0] == 0x2C
    lsd_packed = data[10]
    data2 = bytearray(data[:13])
    data2 += rest[:10] + palette + rest[10:]
    data2[10] = lsd_packed & 0x7F
    data2[13 + 9] = (rest[9] | 0x80) | (lsd_packed & 0x07)
    w, h, out = decode_gif(bytes(data2))
    assert (w, h) == (2, 1) and np.array_equal(out, img)


def test_gif_refusals():
    rng = np.random.default_rng(5)
    too_many = rng.integers(0, 256, size=(17, 17, 3), dtype=np.uint8)
    while len(np.unique(too_many.reshape(-1, 3), axis=0)) <= 256:
        too_many = rng.integers(0, 256, size=(17, 17, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="caps at 256"):
        encode_gif(too_many)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE" + bytes(40))
    data = encode_gif(np.full((4, 4, 3), 9, dtype=np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(data[: len(data) - 8])
    with pytest.raises(ValueError, match="trailer before"):
        decode_gif(data[:19] + b"\x3b")


# --- cross-correlation ----------------------------------------------------------------


def _mkdates(spark, rows):
    return spark.createDataFrame(
        [(datetime.date(2024, 1, 1) + datetime.timedelta(days=d), x, y)
         for d, x, y in rows],
        "d date, x long, y long",
    )


def test_ccf_detects_known_lag(spark):
    # y is x shifted forward by 2 days -> perfect correlation at lag 2
    base = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = [
        (i, base[i], base[i - 2] if i >= 2 else 0) for i in range(len(base))
    ]
    out = {
        r["lag"]: r
        for r in cross_correlation(
            _mkdates(spark, rows), "d", "x", "y", max_lag=3
        ).collect()
    }
    assert out[2]["ccf"] == pytest.approx(1.0, abs=1e-12)
    assert out[2]["n"] == len(base) - 2
    # reference check at lag 1 vs numpy
    xs = np.array([r[1] for r in rows[:-1]], dtype=float)
    ys = np.array([r[2] for r in rows[1:]], dtype=float)
    ref = np.corrcoef(xs, ys)[0, 1]
    assert out[1]["ccf"] == pytest.approx(ref, abs=1e-12)


def test_ccf_pairwise_complete_n_shrinks(spark):
    rows = [(d, d + 1, 2 * d) for d in range(10)]
    out = {
        r["lag"]: r["n"]
        for r in cross_correlation(
            _mkdates(spark, rows), "d", "x", "y", max_lag=4
        ).collect()
    }
    assert out == {0: 10, 1: 9, 2: 8, 3: 7, 4: 6}


def test_ccf_zero_variance_null(spark):
    rows = [(d, 5, d) for d in range(6)]
    out = cross_correlation(
        _mkdates(spark, rows), "d", "x", "y", max_lag=1
    ).collect()
    assert all(r["ccf"] is None for r in out)


# --- mutual best match ------------------------------------------------------------------

from parquet_on_fhir_spark.operators.graph import label_propagation
from parquet_on_fhir_spark.operators.similarity import mutual_best_match


def test_mutual_best_match_drops_asymmetric_pairs(spark):
    pairs = spark.createDataFrame(
        [("l1", "r1", 0.9), ("l1", "r2", 0.8),
         ("l2", "r1", 0.95), ("l2", "r2", 0.5)],
        "left_id string, right_id string, score double",
    )
    got = mutual_best_match(pairs).collect()
    # l1's best is r1, but r1's best is l2 -> only (l2, r1) is mutual
    assert [(r["left_id"], r["right_id"]) for r in got] == [("l2", "r1")]


def test_mutual_best_match_tie_break_is_deterministic(spark):
    pairs = spark.createDataFrame(
        [("l1", "r2", 0.5), ("l1", "r1", 0.5), ("l2", "r2", 0.4)],
        "left_id string, right_id string, score double",
    )
    got = {(r["left_id"], r["right_id"]) for r in mutual_best_match(pairs).collect()}
    # tie at 0.5: l1 -> r1 (smaller id); r1's only candidate is l1
    assert ("l1", "r1") in got
    assert ("l1", "r2") not in got


def test_mutual_best_match_perfect_matching(spark):
    rows = [(f"l{i}", f"r{j}", 1.0 if i == j else 0.1)
            for i in range(4) for j in range(4)]
    pairs = spark.createDataFrame(
        rows, "left_id string, right_id string, score double"
    )
    got = sorted((r["left_id"], r["right_id"])
                 for r in mutual_best_match(pairs).collect())
    assert got == [(f"l{i}", f"r{i}") for i in range(4)]


# --- label propagation --------------------------------------------------------------------


def test_label_propagation_two_cliques(spark):
    clique1 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    clique2 = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    bridge = [(4, 10)]
    df = spark.createDataFrame(
        clique1 + clique2 + bridge, "src long, dst long"
    )
    got = {r["node"]: r["label"] for r in label_propagation(df, iterations=2).collect()}
    assert {got[n] for n in (1, 2, 3, 4)} == {1}
    assert {got[n] for n in (10, 11, 12, 13)} == {10}


def test_label_propagation_isolated_and_guard(spark):
    df = spark.createDataFrame([(5, 5)], "src long, dst long")  # self-loop only
    got = label_propagation(df, iterations=1).collect()
    assert [(r["node"], r["label"]) for r in got] == [(5, 5)]
    with pytest.raises(ValueError, match="iterations"):
        label_propagation(df, iterations=0)


# --- containment pairs ------------------------------------------------------------------

from parquet_on_fhir_spark.operators.analytics import mann_kendall
from parquet_on_fhir_spark.operators.dedup import containment_pairs


def test_containment_detects_planted_fragment(spark):
    words = [f"w{i}" for i in range(60)]
    doc = " ".join(words)
    frag = " ".join(words[:12])  # trigrams of frag all inside doc
    other = " ".join(f"x{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, doc), (2, frag), (3, other)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(df, threshold=0.9).collect()
    }
    assert (2, 1) in got  # fragment contained in doc
    assert got[(2, 1)]["containment"] == pytest.approx(1.0)
    assert got[(2, 1)]["n_sh_a"] == 10  # 12 words -> 10 trigrams
    # the big doc is NOT contained in the fragment
    assert (1, 2) not in got
    assert all(3 not in pair for pair in got)


def test_containment_cap_drops_hot_shingles(spark):
    # a shingle shared by all docs is dropped under cap=2, so the pair
    # loses that shared shingle from its count
    shared_tail = "common tail shingle"
    rows = [(i, f"u{i} v{i} w{i} " + shared_tail) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = containment_pairs(df, threshold=0.01).count()
    capped = containment_pairs(df, threshold=0.01, shingle_cap=2).count()
    assert exact > 0
    assert capped == 0  # only the hot shingle connected the docs


# --- Mann-Kendall -------------------------------------------------------------------------


def _brute_mk(points):
    import math

    pts = sorted(points)
    n = len(pts)
    s = sum(
        (pts[j][1] > pts[i][1]) - (pts[j][1] < pts[i][1])
        for i in range(n) for j in range(i + 1, n)
    )
    from collections import Counter

    ties = Counter(v for _, v in pts)
    tie_term = sum(c * (c - 1) * (2 * c + 5) for c in ties.values())
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if var_s > 0:
        z = ((s - 1) / math.sqrt(var_s) if s > 0
             else (s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
    else:
        z = None
    slopes = sorted(
        (pts[j][1] - pts[i][1]) / (pts[j][0] - pts[i][0])
        for i in range(n) for j in range(i + 1, n)
    )
    m = len(slopes)
    sen = (slopes[m // 2] if m % 2 else
           (slopes[m // 2 - 1] + slopes[m // 2]) / 2)
    return s, var_s, z, sen


def test_mann_kendall_vs_brute(spark):
    rng = random.Random(9)
    series = {
        "up": [(float(i), 2.0 * i + 1) for i in range(30)],
        "noisy": [(float(i), float(rng.randrange(6))) for i in range(50)],
        "flat": [(float(i), 7.0) for i in range(10)],
    }
    rows = [(g, t_, v) for g, pts in series.items() for t_, v in pts]
    df = spark.createDataFrame(rows, "g string, t double, v double")
    got = {r["g"]: r for r in mann_kendall(df, "t", "v", ["g"]).collect()}
    for g, pts in series.items():
        s, var_s, z, sen = _brute_mk(pts)
        r = got[g]
        assert r["s_stat"] == s, g
        assert r["var_s"] == pytest.approx(var_s, abs=1e-9), g
        if z is None:
            assert r["z"] is None
        else:
            assert r["z"] == pytest.approx(z, abs=1e-12), g
        assert r["sen_slope"] == pytest.approx(sen, abs=1e-12), g
    assert got["up"]["sen_slope"] == pytest.approx(2.0)
    assert got["flat"]["z"] is None


def test_mann_kendall_duplicate_timestamps_raise(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 1.0, 2.0)], "g string, t double, v double"
    )
    with pytest.raises(Exception, match="unique timestamps"):
        mann_kendall(df, "t", "v", ["g"]).collect()


# --- isotonic regression (PAV) ------------------------------------------------------------

from parquet_on_fhir_spark.operators.analytics import isotonic_fit


def test_isotonic_hand_example(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 3.0), ("g", 3.0, 2.0)],
        "g string, x double, y double",
    )
    got = sorted(
        (r["block"], r["x_lo"], r["x_hi"], r["y_hat"], r["weight"])
        for r in isotonic_fit(df, "x", "y", ["g"]).collect()
    )
    assert got == [(0, 1.0, 1.0, 1.0, 1), (1, 2.0, 3.0, 2.5, 2)]


def test_isotonic_properties(spark):
    rng = random.Random(77)
    rows = [("g", float(i), float(rng.randrange(10))) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    blocks = sorted(
        isotonic_fit(df, "x", "y", ["g"]).collect(),
        key=lambda r: r["block"],
    )
    # non-decreasing fit
    fits = [r["y_hat"] for r in blocks]
    assert all(a < b for a, b in zip(fits, fits[1:]))  # strictly, post-merge
    # weighted mean preserved
    total = sum(r["y_hat"] * r["weight"] for r in blocks)
    assert total == pytest.approx(sum(y for _, _, y in rows), rel=1e-12)
    # blocks tile the x range in order
    assert blocks[0]["x_lo"] == 0.0 and blocks[-1]["x_hi"] == 199.0
    for a, b in zip(blocks, blocks[1:]):
        assert a["x_hi"] < b["x_lo"]


def test_isotonic_monotone_input_is_identity(spark):
    df = spark.createDataFrame(
        [("g", float(i), float(2 * i)) for i in range(5)],
        "g string, x double, y double",
    )
    got = isotonic_fit(df, "x", "y", ["g"]).collect()
    assert sorted((r["x_lo"], r["y_hat"], r["weight"]) for r in got) == [
        (float(i), float(2 * i), 1) for i in range(5)
    ]


def test_isotonic_x_ties_preaveraged(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 0.0), ("g", 1.0, 2.0), ("g", 2.0, 5.0)],
        "g string, x double, y double",
    )
    got = sorted(
        (r["x_lo"], r["y_hat"], r["weight"])
        for r in isotonic_fit(df, "x", "y", ["g"]).collect()
    )
    assert got == [(1.0, 1.0, 2), (2.0, 5.0, 1)]


# --- animated GIF -------------------------------------------------------------------------

from parquet_on_fhir_spark.operators.multimodal import (
    decode_gif_frames,
    encode_gif_animation,
)


def test_gif_animation_round_trip_full_frames():
    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    f1 = np.full((4, 5, 3), 10, dtype=np.uint8)
    f2 = np.full((4, 5, 3), 200, dtype=np.uint8)
    f3 = pal[rng.integers(0, 6, (4, 5))]
    data = encode_gif_animation([f1, f2, f3], delays_ms=[100, 50, 0])
    frames = decode_gif_frames(data)
    assert [d for d, _ in frames] == [100, 50, 0]
    for (_, got), exp in zip(frames, [f1, f2, f3]):
        assert np.array_equal(got, exp)


def test_gif_animation_subrect_composites_on_canvas():
    base = np.zeros((6, 6, 3), dtype=np.uint8)
    base[:] = (1, 2, 3)
    patch = np.full((2, 2, 3), 99, dtype=np.uint8)
    data = encode_gif_animation(
        [base, patch], rects=[(0, 0), (2, 2)], disposals=[1, 1]
    )
    frames = decode_gif_frames(data)
    exp = base.copy()
    exp[2:4, 2:4] = 99
    assert np.array_equal(frames[1][1], exp)


def test_gif_animation_transparency_shows_canvas_through():
    base = np.zeros((6, 6, 3), dtype=np.uint8)
    base[:] = (1, 2, 3)
    hole = np.full((2, 2, 3), 99, dtype=np.uint8)
    hole[0, 0] = (7, 7, 7)
    data = encode_gif_animation(
        [base, hole], rects=[(0, 0), (2, 2)], transparent=[None, (7, 7, 7)]
    )
    frames = decode_gif_frames(data)
    exp = base.copy()
    exp[2:4, 2:4] = 99
    exp[2, 2] = (1, 2, 3)
    assert np.array_equal(frames[1][1], exp)


def test_gif_animation_disposal_restore_background():
    # disposal 2 on frame 1 restores its rect to the background color
    # (palette entry of the LSD bg byte — our writer pins bg=0, which is
    # the first distinct color) before frame 2 draws elsewhere
    base = np.zeros((4, 4, 3), dtype=np.uint8)  # color (0,0,0) -> bg
    patch = np.full((2, 2, 3), 50, dtype=np.uint8)
    dot = np.full((1, 1, 3), 200, dtype=np.uint8)
    data = encode_gif_animation(
        [base, patch, dot],
        rects=[(0, 0), (0, 0), (3, 3)],
        disposals=[1, 2, 1],
    )
    frames = decode_gif_frames(data)
    # frame 2 shows the patch; frame 3 must NOT (restored to bg)
    assert frames[1][1][0, 0].tolist() == [50, 50, 50]
    assert frames[2][1][0, 0].tolist() == [0, 0, 0]
    assert frames[2][1][3, 3].tolist() == [200, 200, 200]


def test_gif_animation_first_frame_via_decode_gif():
    from parquet_on_fhir_spark.operators.multimodal import decode_gif

    f1 = np.full((3, 3, 3), 10, dtype=np.uint8)
    f2 = np.full((3, 3, 3), 200, dtype=np.uint8)
    _, _, first = decode_gif(encode_gif_animation([f1, f2]))
    assert np.array_equal(first, f1)


def test_gif_animation_max_frames_bound():
    f = [np.full((2, 2, 3), v, dtype=np.uint8) for v in (1, 2, 3)]
    assert len(decode_gif_frames(encode_gif_animation(f), max_frames=2)) == 2


# --- BPE merge training -------------------------------------------------------------------

from parquet_on_fhir_spark.operators.text import bpe_train_merges


def _python_bpe(texts, rounds, min_len=2):
    """Independent reference BPE (dict-of-tuples vocab, the Sennrich
    pseudocode) — no shared code with the Spark operator."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if len(w) >= min_len:
                vocab[tuple(w) + ("</w>",)] += 1
    merges = []
    for rnd in range(rounds):
        pairs = Counter()
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, l, r, l + r, c))
        new_vocab = Counter()
        for sym, freq in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def test_bpe_matches_sennrich_example(spark):
    corpus = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    df = spark.createDataFrame([(corpus[0],)], "text string")
    got = [
        (r["round"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(df, rounds=6).collect()
    ]
    assert got == _python_bpe(corpus, 6)
    # the classic first merges: es, est, est</w>
    assert [g[3] for g in got[:3]] == ["es", "est", "est</w>"]


def test_bpe_matches_reference_on_random_text(spark):
    rng = random.Random(4)
    words = ["abba", "abc", "cab", "bac", "aa", "a.b", "x$y"]
    texts = [
        " ".join(rng.choice(words) for _ in range(40)) for _ in range(5)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["round"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(df, rounds=8).collect()
    ]
    assert got == _python_bpe(texts, 8)  # incl. regex-special symbols


def test_histogram_sketch_error_bounded_by_bin_width(spark):
    # the sketch's quantile error is at most one bin width by
    # construction; pin it against numpy on lognormal-ish data
    rng = np.random.default_rng(11)
    vals = np.exp(rng.normal(3.0, 1.0, 4000))
    lo, hi, bins = 0.0, float(vals.max()) + 1.0, 256
    width = (hi - lo) / bins
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "g string, v double"
    )
    out = {
        r["q"]: r["estimate"]
        for r in histogram_quantile_sketch(
            df, "v", ["g"], lo=lo, hi=hi, bins=bins,
            quantiles=(0.5, 0.9, 0.99), with_global=False,
        ).collect()
    }
    for q in (0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        assert abs(out[q] - exact) <= width + 1e-9, (q, out[q], exact)


# --- product quantization -----------------------------------------------------------------

from parquet_on_fhir_spark.operators.similarity import (
    brute_force_topk,
    pq_encode,
    pq_topk,
    pq_train,
)


def _clustered_vectors(spark, n_clusters=6, per=25, d=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, (n_clusters, d))
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + rng.normal(0, 0.3, d)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_finds_the_right_cluster(spark):
    # coarse PQ (k=8 per subspace over 6 tight clusters) collapses
    # within-cluster distinctions — cluster-mates share codes and tie
    # — so the honest property is CLUSTER recall: every top-5 result
    # of a query must come from the query's own cluster (ids 0-24),
    # which is what an ADC candidate stage feeds a re-rank with
    e = _clustered_vectors(spark)
    books = pq_train(e, m=4, k=8, iters=10)
    enc = pq_encode(e, books)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    approx = pq_topk(enc, queries, books, k=5).collect()
    assert len(approx) == 25
    in_cluster = sum(1 for r in approx if r["vec_id"] < 25)
    assert in_cluster >= 23, f"cluster recall too low: {in_cluster}/25"


def test_pq_exact_when_codebook_covers_vectors(spark):
    # with only 4 distinct vectors and k>=4 per subspace, PQ encodes
    # losslessly, so ADC ranking == brute-force cosine's ranking by
    # inner product on identical-norm vectors
    base = np.eye(4, 8) * 3.0
    rows = [(i, [float(x) for x in base[i % 4]]) for i in range(12)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(e, m=2, k=4, iters=6)
    enc = pq_encode(e, books)
    queries = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = pq_topk(enc, queries, books, k=2).collect()
    # vectors 4 and 8 are identical to the query vector: top-2 by id
    assert [(r["vec_id"], r["rank"]) for r in got] == [(4, 1), (8, 2)]
    # and their ADC score equals the true inner product (lossless codes)
    assert got[0]["score"] == pytest.approx(9.0, abs=1e-6)


def test_pq_dimension_guard(spark):
    e = _clustered_vectors(spark, d=10)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(e, m=4, k=4)


def test_gif_animation_fuzz_round_trip():
    # randomized animations: random frame stack with random sub-rects,
    # disposals and transparency vs an independent python compositor
    rng = np.random.default_rng(99)
    for trial in range(8):
        sw, sh = int(rng.integers(4, 10)), int(rng.integers(4, 10))
        pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
        # make palette rows distinct to keep the color->index map stable
        pal[:, 0] = np.arange(5) * 40
        nf = int(rng.integers(1, 4))
        frames, rects, disposals, transparent = [], [], [], []
        for fi in range(nf):
            if fi == 0:
                w, h, left, top = sw, sh, 0, 0
            else:
                w = int(rng.integers(1, sw + 1))
                h = int(rng.integers(1, sh + 1))
                left = int(rng.integers(0, sw - w + 1))
                top = int(rng.integers(0, sh - h + 1))
            frames.append(pal[rng.integers(0, 5, (h, w))])
            rects.append((left, top))
            disposals.append(int(rng.integers(1, 4)))
            transparent.append(
                tuple(int(x) for x in pal[0]) if rng.random() < 0.5 else None
            )
        data = encode_gif_animation(
            frames, rects=rects, disposals=disposals, transparent=transparent
        )
        got = decode_gif_frames(data)
        # independent compositor
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        # our writer pins bg byte 0 -> first palette entry
        from parquet_on_fhir_spark.operators.multimodal import _gif_palette

        flat = np.concatenate([f.reshape(-1, 3) for f in frames])
        tc = [t for t in transparent if t is not None]
        if tc:
            flat = np.concatenate(
                [flat, np.asarray(tc, dtype=np.uint8).reshape(-1, 3)]
            )
        _, palette, _ = _gif_palette(flat)
        canvas[:] = palette[0]
        for fi, (f, (left, top), disp, tcol) in enumerate(
            zip(frames, rects, disposals, transparent)
        ):
            before = canvas.copy()
            h, w, _ = f.shape
            region = canvas[top : top + h, left : left + w]
            if tcol is None:
                region[:] = f
            else:
                mask = ~np.all(f == np.asarray(tcol, dtype=np.uint8), axis=2)
                region[mask] = f[mask]
            assert np.array_equal(got[fi][1], canvas), (trial, fi)
            if disp == 2:
                canvas[top : top + h, left : left + w] = palette[0]
            elif disp == 3:
                canvas = before


# --- differential fuzz: wave-2 operators vs pure-python references ------------------------


def test_label_propagation_fuzz_vs_reference(spark):
    rng = random.Random(13)
    for trial in range(3):
        n = 14
        edges = {
            (rng.randrange(n), rng.randrange(n)) for _ in range(22)
        }
        df = spark.createDataFrame(
            sorted(edges), "src long, dst long"
        )
        iters = rng.choice([1, 2, 3])
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=iters).collect()
        }
        # independent synchronous reference
        nbrs = {}
        nodes = set()
        for a, b in edges:
            nodes.update((a, b))
            if a != b:
                nbrs.setdefault(a, set()).add(b)
                nbrs.setdefault(b, set()).add(a)
        labels = {v: v for v in nodes}
        for _ in range(iters):
            new = {}
            for v in nodes:
                counts = {}
                for u in nbrs.get(v, ()):
                    counts[labels[u]] = counts.get(labels[u], 0) + 1
                if counts:
                    new[v] = min(
                        counts, key=lambda l: (-counts[l], l)
                    )
                else:
                    new[v] = v
            labels = new
        assert got == labels, (trial, iters)


def test_containment_fuzz_vs_reference(spark):
    rng = random.Random(41)
    for trial in range(3):
        docs = []
        for i in range(12):
            n_words = rng.randrange(3, 15)
            docs.append(
                (i, " ".join(
                    f"w{rng.randrange(8)}" for _ in range(n_words)
                ))
            )
        df = spark.createDataFrame(docs, "doc_id long, text string")
        thr = rng.choice([0.3, 0.6, 0.9])
        got = {
            (r["id_a"], r["id_b"]): (r["shared"], r["n_sh_a"])
            for r in containment_pairs(df, threshold=thr).collect()
        }

        def sh(text, k=3):
            toks = text.lower().split()
            if len(toks) <= k:
                return {" ".join(toks[:k])}
            return {
                " ".join(toks[i : i + k])
                for i in range(len(toks) - k + 1)
            }

        expect = {}
        for ia, ta in docs:
            for ib, tb in docs:
                if ia == ib:
                    continue
                sa, sb = sh(ta), sh(tb)
                shared = len(sa & sb)
                if shared and shared / len(sa) >= thr:
                    expect[(ia, ib)] = (shared, len(sa))
        assert got == expect, trial


def test_mutual_best_match_fuzz_vs_reference(spark):
    rng = random.Random(8)
    for trial in range(3):
        pairs = [
            (f"l{rng.randrange(5)}", f"r{rng.randrange(5)}",
             round(rng.random(), 3))
            for _ in range(18)
        ]
        # dedupe pair keys keeping max score (operator contract: one
        # score per candidate pair)
        dd = {}
        for l, r, sc in pairs:
            dd[(l, r)] = max(dd.get((l, r), -1.0), sc)
        rows = [(l, r, s) for (l, r), s in sorted(dd.items())]
        df = spark.createDataFrame(
            rows, "left_id string, right_id string, score double"
        )
        got = {
            (r["left_id"], r["right_id"])
            for r in mutual_best_match(df).collect()
        }
        best_l = {}
        for l, r, s in rows:
            cur = best_l.get(l)
            if cur is None or (s, ) > (cur[1],) or (s == cur[1] and r < cur[0]):
                if cur is None or s > cur[1] or (s == cur[1] and r < cur[0]):
                    best_l[l] = (r, s)
        best_r = {}
        for l, r, s in rows:
            cur = best_r.get(r)
            if cur is None or s > cur[1] or (s == cur[1] and l < cur[0]):
                best_r[r] = (l, s)
        expect = {
            (l, rs[0])
            for l, rs in best_l.items()
            if best_r.get(rs[0], (None,))[0] == l
        }
        assert got == expect, trial


# --- unicode normalization audit ----------------------------------------------------------

from parquet_on_fhir_spark.operators.text import unicode_normalization_audit


def test_nfc_audit_flags_decomposed_text(spark):
    rows = [
        (1, "plain ascii"),
        (2, "café"),          # decomposed acute -> café (5 -> 4 cps)
        (3, "café"),            # already NFC
        (4, None),
        (5, "ﬁne"),             # ligature fi: NFC keeps it, NFKC folds
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           unicode_normalization_audit(df).collect()}
    assert got[1]["changed"] is False
    assert got[2]["changed"] is True
    assert (got[2]["len_before"], got[2]["len_after"]) == (5, 4)
    assert got[3]["changed"] is False
    assert got[4]["changed"] is None
    assert got[5]["changed"] is False  # NFC preserves compatibility chars
    nfkc = {r["doc_id"]: r for r in
            unicode_normalization_audit(df, form="NFKC").collect()}
    assert nfkc[5]["changed"] is True  # NFKC folds the ligature
    assert nfkc[5]["len_after"] == 4
    with pytest.raises(ValueError, match="normalization form"):
        unicode_normalization_audit(df, form="NFX")


# --- grid radius join ---------------------------------------------------------------------

from parquet_on_fhir_spark.operators.joins import grid_radius_join


def _haversine(a, b):
    lat1, lon1 = math.radians(a[0]), math.radians(a[1])
    lat2, lon2 = math.radians(b[0]), math.radians(b[1])
    h = (
        math.sin((lat2 - lat1) / 2) ** 2
        + math.cos(lat1) * math.cos(lat2)
        * math.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * 6371 * math.asin(math.sqrt(h))


def test_grid_radius_join_matches_brute_force(spark):
    rng = random.Random(6)
    pts = [
        (i, rng.uniform(-80, 80), rng.uniform(-180, 180))
        for i in range(150)
    ]
    # force high-latitude and date-line clusters so the corrected lon
    # span and the modular wrap both carry matches
    pts += [(200 + i, 78.0 + rng.uniform(0, 1), -179.9 + i * 0.1)
            for i in range(6)]
    pts += [(300 + i, 78.3, 179.8 + i * 0.1 - 0.3) for i in range(4)]
    points = spark.createDataFrame(
        pts, "point_id long, lat double, lon double"
    )
    probes = points.filter(F.col("point_id").isin([0, 1, 200, 300])).select(
        F.col("point_id").alias("probe_id"), "lat", "lon"
    )
    r = 700.0
    got = {
        (row["probe_id"], row["point_id"])
        for row in grid_radius_join(points, probes, r).collect()
    }
    by_id = {i: (la, lo) for i, la, lo in pts}
    expect = {
        (p, q)
        for p in (0, 1, 200, 300)
        for q in by_id
        if _haversine(by_id[p], by_id[q]) <= r
    }
    assert got == expect
    # the date-line cluster must pair across the wrap
    assert any(p == 300 and q >= 200 and q < 210 for p, q in got)


def test_grid_radius_join_polar_guard(spark):
    points = spark.createDataFrame(
        [(1, 89.0, 0.0)], "point_id long, lat double, lon double"
    )
    probes = spark.createDataFrame(
        [(9, 0.0, 0.0)], "probe_id long, lat double, lon double"
    )
    with pytest.raises(Exception, match="lat"):
        grid_radius_join(points, probes, 100.0).collect()


# --- rolling-origin splits ----------------------------------------------------------------

import datetime as _dt

from parquet_on_fhir_spark.operators.timeseries import rolling_origin_splits


def test_rolling_origin_fold_structure(spark):
    # 10 daily buckets, 3 folds, horizon 2: last fold tests buckets
    # 8-9, folds step back one bucket each
    rows = [
        (_dt.datetime(2024, 1, 1) + _dt.timedelta(days=d), i)
        for d in range(10) for i in range(d + 1)  # d+1 rows per day
    ]
    df = spark.createDataFrame(rows, "ts timestamp, x int")
    got = rolling_origin_splits(df, "ts", n_folds=3, horizon=2).collect()
    by_fold = {}
    for r in got:
        by_fold.setdefault(r["fold"], {}).setdefault(r["role"], []).append(
            (r["bucket"], r["n_rows"])
        )
    for fold in (0, 1, 2):
        cut = (10 - 2 - 1) - (2 - fold)  # 5, 6, 7
        train_days = sorted(b.day for b, _ in by_fold[fold]["train"])
        test_days = sorted(b.day for b, _ in by_fold[fold]["test"])
        assert train_days == list(range(1, cut + 2)), fold
        assert test_days == [cut + 2, cut + 3], fold
    # counts survive: day d holds d+1 rows (day-of-month = d+1)
    assert all(
        n == b.day for f in by_fold.values()
        for rs in f.values() for b, n in rs
    )
    # train of fold 2 ends exactly where test begins; no overlap
    assert set(b for b, _ in by_fold[2]["train"]).isdisjoint(
        b for b, _ in by_fold[2]["test"]
    )


def test_rolling_origin_too_short_raises(spark):
    df = spark.createDataFrame(
        [(_dt.datetime(2024, 1, 1 + d), 1) for d in range(4)],
        "ts timestamp, x int",
    )
    with pytest.raises(ValueError, match="need >="):
        rolling_origin_splits(df, "ts", n_folds=3, horizon=2)
