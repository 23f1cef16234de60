"""As-of and interval joins (SURVEY.md §2B Q18-Q19).

Spark has no native ASOF JOIN. The scalable formulation used here is the
union-sort one: tag both inputs, union, hash-partition by the equi key,
sort each partition by (ts, side), and carry the most recent right-side
row forward with ``last(..., ignorenulls=True)``. Cost: ONE shuffle of
left+right (same as any equi-join), no range cross-product, no skew
amplification beyond the key's own skew — this survives a 100× scale-up
where the naive range-join (equi key + ts<=t predicate, then argmax)
materializes every (left, right-candidate) pair first.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_ts <= left.left_ts`` and equal ``on`` keys (backward
    as-of, inclusive). ``right_cols`` are the right columns to carry
    (renamed ``asof_<col>``); ``asof_ts`` carries the matched timestamp.

    ``tolerance``: optional SQL interval string (e.g. ``'1 hour'``) —
    matches older than ``left_ts - tolerance`` are nulled out.
    ``tiebreak``: optional right column; when several right rows share a
    timestamp, the one with the greatest tiebreak value wins
    (deterministic results under ts collisions).
    """
    on = list(on)
    carried = [c for c in right_cols if c not in on and c != right_ts]

    # Helper columns get collision-proof names so a left table that
    # already carries '__'-prefixed columns (this format's own annotation
    # convention!) or a literal '__ts' passes through untouched.
    lhs_cols = list(left.columns)
    taken = set(lhs_cols) | set(right.columns)

    def _uniq(base: str) -> str:
        name, i = base, 0
        while name in taken:
            i += 1
            name = f"{base}_{i}"
        taken.add(name)
        return name

    ts_h = _uniq("__asof_ts_h")
    side_h = _uniq("__asof_side_h")
    r_h = {c: _uniq(f"__asof_r_{c}") for c in carried}

    lhs = left.withColumn(ts_h, F.col(left_ts).cast("timestamp")).withColumn(
        side_h, F.lit(1)
    )
    # At equal timestamps the right row must sort BEFORE the left row so
    # the match is inclusive → side 0 for right.
    rhs = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).cast("timestamp").alias(ts_h),
        F.lit(0).alias(side_h),
        *[F.col(c).alias(r_h[c]) for c in carried],
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    order = [F.col(ts_h).asc(), F.col(side_h).asc()]
    if tiebreak is not None:
        # Orders right rows with equal ts among themselves; left rows are
        # already after them via side order, so nulls here are harmless.
        order.append(F.col(r_h[tiebreak]).asc_nulls_first())
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "asof_ts", F.last(F.when(F.col(side_h) == 0, F.col(ts_h)), ignorenulls=True).over(w)
    )
    for c in carried:
        filled = filled.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col(side_h) == 0, F.col(r_h[c])), ignorenulls=True).over(w),
        )

    out = filled.filter(F.col(side_h) == 1).select(
        *lhs_cols, "asof_ts", *[f"asof_{c}" for c in carried]
    )
    if tolerance is not None:
        too_old = F.col("asof_ts") < F.col(left_ts).cast("timestamp") - F.expr(
            f"INTERVAL {tolerance}"
        )
        out = out.select(
            *lhs_cols,
            F.when(too_old, F.lit(None)).otherwise(F.col("asof_ts")).alias("asof_ts"),
            *[
                F.when(too_old, F.lit(None)).otherwise(F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in carried
            ],
        )
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
) -> DataFrame:
    """Rows whose [start,end] intervals overlap (closed), with equal keys.

    With an equi key this is a plain hash join plus residual range
    predicates — Catalyst evaluates the residual after the hash match, so
    there is no cross-product. Only key-skew matters (AQE skew-join
    handles it).
    """
    cond = None
    for k in on:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (left[left_start] <= right[right_end])
        & (right[right_start] <= left[left_end])
    )
    return left.join(right, cond, "inner")


_UNITS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}


def _interval_seconds(spec: str) -> int:
    n, unit = spec.strip().split()
    return int(n) * _UNITS[unit.rstrip("s").lower()]


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: str = "1 day",
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Interval overlap WITHOUT an equi key: time-bucketize both sides so
    the join becomes an equi-join on the bucket id plus residual range
    predicates.

    Each interval explodes into the epoch-aligned buckets it touches
    (``sequence(floor(start), floor(end))``); overlapping pairs share at
    least one bucket. Multi-bucket double matches are eliminated at the
    source, not deduped after: a pair is emitted only from its CANONICAL
    bucket — the bucket containing ``greatest(l_start, r_start)`` (the
    overlap start, which both intervals touch by definition) — so each
    overlapping pair joins exactly once, legitimately duplicate input
    rows keep their join multiplicity, and there is no post-join
    dropDuplicates shuffle at all. This is the 100 TB-safe plan for
    range joins: shuffle is O(rows × avg buckets per interval), never
    O(n²). Size ``bucket`` near the typical interval length to keep the
    blow-up factor ~2.
    """
    secs = bucket_seconds if bucket_seconds is not None else _interval_seconds(bucket)

    def bucketize(df: DataFrame, start: str, end: str) -> DataFrame:
        def floor_bucket(c: str):
            return F.timestamp_seconds(
                (F.unix_timestamp(F.col(c)) / secs).cast("long") * secs
            )

        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    floor_bucket(start),
                    floor_bucket(end),
                    F.expr(f"INTERVAL {secs} SECONDS"),
                )
            ),
        )

    lb = bucketize(left, left_start, left_end)
    rb = bucketize(right, right_start, right_end).withColumnRenamed(
        "__bucket", "__rbucket"
    )
    overlap_start = F.greatest(lb[left_start], rb[right_start])
    canonical_bucket = F.timestamp_seconds(
        (F.unix_timestamp(overlap_start) / secs).cast("long") * secs
    )
    joined = lb.join(
        rb,
        (lb["__bucket"] == rb["__rbucket"])
        & (lb[left_start] <= rb[right_end])
        & (rb[right_start] <= lb[left_end])
        & (lb["__bucket"] == canonical_bucket),
        "inner",
    ).drop("__bucket", "__rbucket")
    return joined


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    left_id: str | None = None,
    right_id: str | None = None,
) -> DataFrame:
    """Edit-distance join (entity resolution / record linkage): all
    (left, right) pairs with ``levenshtein(left_col, right_col) <=
    max_dist``, without the O(n²) cross join.

    Blocking is the FastSS deletion neighborhood (Bocek et al., 2007):
    two strings within edit distance k share at least one member of
    their ≤k-deletion neighborhoods, so generating every ≤k-deletion
    variant map-side (string of n chars → Σ C(n,i) variants, n+1 for
    k=1) turns candidate generation into an EQUI-join on the variant.
    Exactly the LSH shape: map-side expansion, shuffle on short variant
    keys, exact ``levenshtein`` verification only on collisions —
    sound AND complete (no missed pairs, unlike similarity-only
    blocking). Cost grows O(n^k) per string in variant count, so k is
    capped at 2; beyond that use an n-gram prefilter instead.

    Output: left row id, right row id, the two strings, ``dist``.
    """
    if max_dist < 0 or max_dist > 2:
        raise ValueError("fuzzy_join supports max_dist in 0..2")
    left_id = left_id or left.columns[0]
    right_id = right_id or right.columns[0]

    def deletions(col, k):
        """All strings obtainable from ``col`` by deleting ≤k chars."""
        one = lambda s: F.array_union(
            F.array(s),
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
                lambda i: F.concat(
                    F.substring(s, 1, i - 1),
                    s.substr(i + 1, F.length(s)),
                ),
            ),
        )
        out = one(col)
        if k >= 2:
            out = F.array_distinct(F.flatten(F.transform(out, one)))
        return out

    lv = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_col).alias("__ls"),
        F.explode(deletions(F.col(left_col), max_dist)).alias("__v"),
    )
    rv = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_col).alias("__rs"),
        F.explode(deletions(F.col(right_col), max_dist)).alias("__v"),
    )
    cand = (
        lv.join(rv, "__v")
        .select("__lid", "__ls", "__rid", "__rs")
        .dropDuplicates(["__lid", "__rid"])
    )
    dist = F.levenshtein(F.col("__ls"), F.col("__rs"))
    return cand.filter(dist <= max_dist).select(
        F.col("__lid").alias(left_id if left_id != right_id else f"{left_id}_l"),
        F.col("__rid").alias(right_id if left_id != right_id else f"{right_id}_r"),
        F.col("__ls").alias(left_col if left_col != right_col else f"{left_col}_l"),
        F.col("__rs").alias(right_col if left_col != right_col else f"{right_col}_r"),
        dist.alias("dist"),
    )


def set_similarity_join(
    df: "DataFrame",
    id_col: str,
    tokens_col: str,
    threshold: float = 0.7,
    candidate_budget: float | None = 0.25,
) -> "DataFrame":
    """Exact set-similarity self-join: every pair of rows whose token
    SETS have Jaccard ≥ ``threshold`` — the tag/keyword/shingle-level
    counterpart to MinHash (operators/dedup.py), EXACT where MinHash
    is probabilistic, for the regimes where false negatives are not
    acceptable (entity resolution, compliance dedup).

    Prefix filtering (Chaudhuri et al., ICDE'06 / Bayardo et al.
    WWW'07 "All-Pairs"): tokens are ordered rarest-first by GLOBAL
    frequency (one vocabulary-sized aggregate, broadcast back); a pair
    at Jaccard ≥ t must share a token among each side's first
    |s| − ⌈t·|s|⌉ + 1 tokens, so candidates come from an equi-join on
    PREFIX tokens only — the frequent tokens that would explode a
    naive token join never enter the join key unless they sit in a
    short prefix. Length filter |y| ≥ t·|x| prunes before
    verification; exact Jaccard via array_intersect decides. Never
    all-pairs: cost is Σ_token prefix-df(token)², the published
    All-Pairs bound. That bound is the honest scale lever: on Zipfian
    tag/shingle/entity sets it is ≪ n², but on dense TEMPLATE corpora
    (every row drawing from one small shared vocabulary) it
    degenerates toward n² — measured at 52% of all-pairs on the
    synthetic documents table (SCALE_NOTES.md, seventh wave). In that
    regime reach for MinHash-LSH (operators/dedup.py) and accept the
    probabilistic recall; this operator is for the exactness-required
    regimes.  ``candidate_budget`` (default 25% of all-pairs) enforces
    that boundary mechanically: the exact Σ C(prefix-df, 2) bound is
    computed BEFORE the candidate join (one vocabulary-sized
    aggregate) and a breach raises with a MinHash pointer instead of
    silently going quadratic — see :func:`_set_similarity_guard`.
    ``candidate_budget=None`` opts out.

    Output: (id_a, id_b, jaccard), id_a < id_b, one row per qualifying
    pair.

    The candidate join is SKINNY (id, set-size, prefix-token — never
    the token arrays): a pair sharing m prefix tokens appears m times,
    and dense template-vocabulary corpora push Σ prefix-df² toward n²
    (the r8 ×10 probe measured 2.3× all-pairs ROW multiplicity on the
    synthetic documents table) — shuffling arrays at that multiplicity
    would move prefix-length × corpus-text bytes. Instead candidates
    are DISTINCT'd to unique id pairs first, then the token arrays
    join back once per side and each surviving pair is verified
    exactly once.
    """
    t = float(threshold)
    if not 0 < t <= 1:
        raise ValueError("threshold must be in (0, 1]")
    ordered = _set_similarity_ordered(df, id_col, tokens_col)
    # candidate frames reference `ordered` three times (two candidate
    # sides + the verify re-join); cut the lineage so the vocab join +
    # rarest-first sort computes once
    ordered = ordered.localCheckpoint(eager=False)
    if candidate_budget is not None:
        _set_similarity_guard(ordered, t, float(candidate_budget))
    pairs = _set_similarity_candidates(ordered, t).select(
        "id_a", "id_b"
    ).distinct()
    va = ordered.select(
        F.col("__id").alias("id_a"),
        F.col("__n").alias("__na"),
        F.col("__sorted").alias("__ta"),
    )
    vb = ordered.select(
        F.col("__id").alias("id_b"),
        F.col("__n").alias("__nb"),
        F.col("__sorted").alias("__tb"),
    )
    verified = pairs.join(va, "id_a").join(vb, "id_b")
    inter = F.size(F.array_intersect("__ta", "__tb"))
    jac = inter / (F.col("__na") + F.col("__nb") - inter)
    return (
        verified.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
    )


def _set_similarity_guard(
    ordered: "DataFrame",
    t: float,
    budget: float,
    min_candidates: float = 1e5,
) -> None:
    """Pre-flight cost check for :func:`set_similarity_join` — the
    guard the r8 verdict asked for.  The candidate join's row count is
    bounded by Σ_token C(prefix-df(token), 2) (the published All-Pairs
    cost lever); on template-vocabulary corpora (every row drawing
    from one small shared vocabulary) that bound degenerates toward
    the n² all-pairs count — measured at 52% of all pairs on the
    synthetic documents table, with ×10 docs → ×100 candidates
    (SCALE_NOTES.md, seventh/eighth waves).  A docstring warning is
    not a guard at 100 TB, so this computes the EXACT bound before the
    join: one prefix-explode aggregate (vocabulary-sized, trivially
    cheaper than the candidate join it protects) + one count, and
    raises when the bound exceeds ``budget × C(n, 2)``.

    Raises ValueError naming the measured ratio and pointing at
    MinHash-LSH (operators/dedup.py::dedup_minhash_lsh) — the right
    tool for the degenerate regime; pass ``candidate_budget=None`` (or
    a larger fraction) to accept quadratic cost knowingly.  Estimates
    run in DOUBLE: they only steer a decision, and pdf² would overflow
    BIGINT near df ~ 3e9.
    """
    prefix_len = (
        F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + 1
    ).cast("int")
    n = ordered.count()
    if n < 2:
        return
    row = (
        ordered.select(
            F.explode(F.slice("__sorted", 1, prefix_len)).alias("__ptok")
        )
        .groupBy("__ptok")
        .agg(F.count("*").alias("__pdf"))
        .agg(
            F.sum(
                F.col("__pdf").cast("double")
                * (F.col("__pdf") - 1).cast("double")
                / 2.0
            ).alias("est")
        )
        .collect()[0]
    )
    est = float(row["est"] or 0.0)
    all_pairs = n * (n - 1) / 2.0
    # the ratio alone is meaningless on toy corpora (6 rows sharing a
    # token is "80% of all pairs" but costs nothing); the guard exists
    # to stop CLUSTER-scale quadratic joins, so it fires only when the
    # bound is also large in absolute terms
    if est > budget * all_pairs and est > min_candidates:
        raise ValueError(
            f"set_similarity_join candidate budget exceeded: the "
            f"All-Pairs prefix-filter bound is {est:.3g} candidate "
            f"pairs = {est / all_pairs:.1%} of the n*(n-1)/2 all-pairs "
            f"count (n={n}, budget={budget:.0%}). This corpus is in "
            f"the prefix filter's degenerate (template-vocabulary) "
            f"regime where the join goes quadratic at scale. Use "
            f"MinHash-LSH (operators/dedup.py::dedup_minhash_lsh) for "
            f"probabilistic near-dup at linear cost, or pass "
            f"candidate_budget=None / a larger fraction to proceed "
            f"anyway."
        )


def _set_similarity_ordered(
    df: "DataFrame", id_col: str, tokens_col: str
) -> "DataFrame":
    """(__id, __n, __sorted): each row's distinct token set in the
    rarest-first canonical order (global df ascending, token as the
    tie-break) that prefix filtering requires."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(F.col(tokens_col)).alias("__toks"),
    ).filter(F.size("__toks") > 0)
    vocab = toks.select(F.explode("__toks").alias("__tok")).groupBy(
        "__tok"
    ).agg(F.count("*").alias("__df"))
    exploded = toks.select(
        "__id", F.size("__toks").alias("__n"), F.explode("__toks").alias("__tok")
    ).join(F.broadcast(vocab), "__tok")
    return exploded.groupBy("__id", "__n").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("__tok")))
            ),
            lambda s: s["__tok"],
        ).alias("__sorted")
    )


def _set_similarity_candidates(ordered: "DataFrame", t: float):
    """Candidate stage of :func:`set_similarity_join`: the SKINNY
    prefix-token equi-join + length filter, before verification —
    (id_a, id_b) with one row per SHARED prefix token. Only (id, n,
    ptok) enters the shuffle; the token arrays stay home. Exposed so
    the scale probe can measure the All-Pairs cost lever (candidate
    rows vs the n² bound) directly."""
    prefix_len = (F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + 1).cast("int")
    pref = ordered.select(
        "__id",
        "__n",
        F.explode(F.slice("__sorted", 1, prefix_len)).alias("__ptok"),
    )
    a = pref.select(
        F.col("__id").alias("id_a"), F.col("__n").alias("__na"), "__ptok"
    )
    b = pref.select(
        F.col("__id").alias("id_b"), F.col("__n").alias("__nb"), "__ptok"
    )
    return (
        a.join(b, "__ptok")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.col("__nb") >= F.ceil(F.lit(t) * F.col("__na")))
            & (F.col("__na") >= F.ceil(F.lit(t) * F.col("__nb")))
        )
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Exact LEFT SEMI join with a Bloom-filter PREFILTER on the fact
    side (r12) — the runtime-filter pattern (Spark's
    InjectRuntimeFilter / the classic semi-join reduction) as an
    explicit operator, for when the dim side is too big to broadcast
    but the fact side is much bigger still.

    Build: each dim key sets ``n_hashes`` bit positions
    (xxhash64(key, seed) mod m), the positions fold into a
    ``m_bits/64``-word bitmap with one bit_or hash aggregate, and the
    words densify into ONE array row — the dim table reduces to a
    FIXED-SIZE bitmap (1M bits = 16 KB) entirely on the executors,
    never touching the driver. Probe: the bitmap row broadcast-cross-
    joins the fact side (one row — a broadcast nested loop that is
    really a constant), which then filters with k word-lookups
    (element_at + bitwise AND) BEFORE the exact semi join — Bloom
    false positives are removed by the join, false negatives are
    impossible, so results are EXACT and the shuffle only carries
    fact rows that (probably) match. (An array LITERAL instead of the
    broadcast row costs ~10 s of plan serialization/codegen at the
    default m_bits — measured; the data path is the fix.)

    At 100 TB: the prefilter runs map-side inside the fact scan stage
    (no exchange), cutting the semi join's shuffle volume by the
    filter's selectivity; the bitmap build is one aggregation over the
    dim at ~16 KB of state. Size ``m_bits`` ≈ 10-15 bits per distinct
    dim key for a ~1% false-positive rate.

    Output: fact rows whose ``fact_key`` appears in dim's ``dim_key``
    (exact semi-join semantics; NULL keys never match).
    """
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    dim_key = dim_key or fact_key
    n_words = m_bits // 64

    def positions(col: str):
        return [
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits))
            for i in range(n_hashes)
        ]

    bits = dim.filter(F.col(dim_key).isNotNull()).select(
        F.explode(F.array(*positions(dim_key))).alias("p")
    )
    words = (
        bits.select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, int(p % 64))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bm"))
    )
    # densify the sparse word rows into one array<long> row, JVM-side:
    # left-join a range frame so every word index exists exactly once,
    # then sort-collect and project — O(n log n), NOT a per-index map
    # lookup (element_at over a 16k-entry map is a linear scan; the
    # O(n²) variant measured 13 s at the default m_bits)
    dense = (
        fact.sparkSession.range(n_words)
        .select(F.col("id").cast("int").alias("w"))
        .join(words, "w", "left")
        .select(
            "w", F.coalesce("bm", F.lit(0).cast("long")).alias("bm")
        )
    )
    bm_row = dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bm"))),
            lambda x: x["bm"],
        ).alias("__bloom_arr")
    )
    checks = " AND ".join(
        f"(element_at(__bloom_arr, int(element_at(__bp, {i + 1}) div 64) + 1)"
        f" & shiftleft(1L, int(element_at(__bp, {i + 1}) % 64))) != 0"
        for i in range(n_hashes)
    )
    pre = (
        fact.filter(F.col(fact_key).isNotNull())
        .crossJoin(F.broadcast(bm_row))
        .withColumn("__bp", F.array(*positions(fact_key)))
        .filter(F.expr(checks))
        .drop("__bloom_arr", "__bp")
    )
    return pre.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )


def grid_radius_join(
    points: DataFrame,
    probes: DataFrame,
    radius_km: float,
    point_id: str = "point_id",
    probe_id: str = "probe_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 85.0,
) -> DataFrame:
    """Spatial radius join — all (probe, point) pairs within
    ``radius_km`` great-circle distance — via GRID BUCKETING: the
    scalable alternative to the cross join a naive distance filter
    plans. Points land once in a (lat-cell, lon-cell) grid sized to
    the radius; each probe explodes to its neighbor cells — ±1 lat
    cell and a latitude-corrected ±ceil(1/cos φ) lon span, so candidate
    completeness holds at high latitude where a degree of longitude
    shrinks — and the exact haversine filter runs only on co-bucketed
    candidates. Longitude cells wrap modulo the grid (date-line
    crossing handled); latitudes beyond ``max_abs_lat`` raise (polar
    caps need a different index; document your data, don't guess).

    Scale shape: ONE equi-join keyed by (cell_lat, cell_lon) — the
    probe fan-out is 3×(2k+1) cells per probe, never the point count;
    candidate volume is density-bound per cell. Distances are fixed
    double chains (radians/sin/cos/asin), restatable; an oracle that
    brute-forces all pairs and matches exactly is the no-missed-
    candidate proof.

    Output: (probe_id, point_id, dist_km).
    """
    import math

    ddeg = radius_km / 111.0  # ~km per degree latitude
    n_lon = max(1, int(math.ceil(360.0 / ddeg)))

    def cells(df, idc, explode_neighbors):
        lat, lon = F.col(lat_col), F.col(lon_col)
        guard = F.when(
            F.abs(lat) > max_abs_lat,
            F.raise_error(
                F.concat(
                    F.lit(f"grid_radius_join: |lat| > {max_abs_lat} "),
                    lat.cast("string"),
                )
            ),
        )
        cell_lat = F.floor((lat + 90.0) / ddeg).cast("long")
        cell_lon = (
            F.floor((lon + 180.0) / ddeg).cast("long") % n_lon + n_lon
        ) % n_lon
        base = df.select(
            F.col(idc),
            lat.alias(f"__{idc}_lat"),
            lon.alias(f"__{idc}_lon"),
            F.coalesce(guard, cell_lat).alias("cl"),
            cell_lon.alias("cn"),
        )
        if not explode_neighbors:
            return base
        k = F.ceil(
            1.0
            / F.cos(F.radians(F.least(F.abs(F.col(f"__{idc}_lat")), F.lit(max_abs_lat))))
        ).cast("int")
        return (
            base.select(
                "*",
                F.explode(
                    F.sequence(F.lit(-1), F.lit(1))
                ).alias("__dlat"),
            )
            .select(
                "*",
                F.explode(F.sequence(-k, k)).alias("__dlon"),
            )
            .select(
                F.col(idc),
                F.col(f"__{idc}_lat"),
                F.col(f"__{idc}_lon"),
                (F.col("cl") + F.col("__dlat")).alias("cl"),
                (
                    (F.col("cn") + F.col("__dlon")) % n_lon + n_lon
                ).alias("cn_raw"),
            )
            .select(
                F.col(idc),
                F.col(f"__{idc}_lat"),
                F.col(f"__{idc}_lon"),
                "cl",
                (F.col("cn_raw") % n_lon).alias("cn"),
            )
        )

    pts = cells(points, point_id, explode_neighbors=False)
    prb = cells(probes, probe_id, explode_neighbors=True)
    cand = prb.join(pts, ["cl", "cn"])
    lat1 = F.radians(F.col(f"__{probe_id}_lat"))
    lat2 = F.radians(F.col(f"__{point_id}_lat"))
    dlat = lat2 - lat1
    dlon = F.radians(
        F.col(f"__{point_id}_lon") - F.col(f"__{probe_id}_lon")
    )
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
    )
    dist = 2.0 * 6371.0 * F.asin(F.sqrt(h))
    return (
        cand.select(
            probe_id, point_id, dist.alias("dist_km")
        )
        .filter(F.col("dist_km") <= radius_km)
        .distinct()
    )


def fs_link_score(
    pairs: DataFrame,
    field_params: dict,
    term_dp: int = 12,
    upper: float = 3.0,
    lower: float = -3.0,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage scoring (Fellegi &
    Sunter 1969 — the classical entity-resolution decision model):
    each candidate pair's log-odds match weight is the sum of
    per-field agreement weights, w_i = log₂(m_i/u_i) on agreement and
    log₂((1−m_i)/(1−u_i)) on disagreement, where m_i = P(agree |
    match) and u_i = P(agree | non-match).  Pairs classify as
    ``match`` (≥ ``upper``), ``possible`` (between) or ``non_match``
    (≤ ``lower``) — the clerical-review band is the model's point.

    ``pairs`` carries one BOOLEAN agreement column per field (NULL
    counts as disagreement — an unverifiable field should not add
    weight); ``field_params`` maps column → (m, u) with 0 < u < m < 1
    (agreement must be MORE likely under a match, or the field is
    wired backwards — validated here).  Map-only over the candidate
    frame (a literal CASE sum; each log term ``term_dp``-quantized —
    the cross-engine transcendental convention), so it rides whatever
    blocking produced the candidates (:func:`fuzzy_join`,
    :func:`set_similarity_join`, LSH buckets) and never sees the
    n² pair space itself.  Estimate (m, u) with :func:`fs_em_fit`.

    Output: input columns + (fs_score double, match_class string).
    """
    import math

    if not field_params:
        raise ValueError("fs_link_score needs at least one field")
    score = F.lit(0.0)
    for col, (m, u) in sorted(field_params.items()):
        m, u = float(m), float(u)
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"fs_link_score: field {col!r} needs 0 < u < m < 1 "
                f"(got m={m}, u={u})"
            )
        w_agree = round(math.log2(m / u), term_dp)
        w_disagree = round(math.log2((1.0 - m) / (1.0 - u)), term_dp)
        score = score + F.when(
            F.coalesce(F.col(col), F.lit(False)), F.lit(w_agree)
        ).otherwise(F.lit(w_disagree))
    score = F.round(score, term_dp)
    return pairs.withColumn("fs_score", score).withColumn(
        "match_class",
        F.when(F.col("fs_score") >= upper, "match")
        .when(F.col("fs_score") <= lower, "non_match")
        .otherwise("possible"),
    )


def fs_em_fit(
    pairs: DataFrame,
    agree_cols: list[str],
    iterations: int = 10,
    prevalence: float = 0.1,
    m_init: float = 0.9,
    u_init: float = 0.1,
) -> list:
    """EM estimation of the Fellegi–Sunter (m, u) probabilities under
    conditional independence (the Splink/fastLink formulation) — the
    UNSUPERVISED half of probabilistic linkage: no labeled pairs, just
    the observed agreement patterns.

    Per EM round, the E-step responsibility w(γ) = p·Π mᵢ^γᵢ(1−mᵢ)^
    (1−γᵢ) / (… + (1−p)·Π uᵢ^γᵢ(1−uᵢ)^(1−γᵢ)) is a map-side
    expression from the CURRENT params, and the M-step is ONE hash
    aggregate over the candidate frame (Σw, Σwγᵢ, Σ(1−w)γᵢ) — K
    iterations = K single-aggregate jobs; the collected frame is the
    2k+1 moment scalars, never pair rows (the sanctioned driver-side
    class).  Parameters are clamped to [1e-6, 1−1e-6] so a degenerate
    field cannot NaN the next E-step.  Iterative MLE → rows-only by
    design; verified against an independent numpy EM in tests.

    Returns [(col, m, u), ...] plus ("__prevalence__", p, p) — feed
    the per-field rows to :func:`fs_link_score`.
    """
    if iterations < 1:
        raise ValueError("fs_em_fit needs iterations >= 1")
    if not agree_cols:
        raise ValueError("fs_em_fit needs at least one agreement column")
    lo, hi = 1e-6, 1.0 - 1e-6
    p = min(max(float(prevalence), lo), hi)
    m = {c: float(m_init) for c in agree_cols}
    u = {c: float(u_init) for c in agree_cols}
    g = {
        c: F.coalesce(F.col(c), F.lit(False)).cast("int").cast("double")
        for c in agree_cols
    }
    from math import log as _ln

    for _ in range(iterations):
        lm = F.lit(_ln(p))
        lu = F.lit(_ln(1.0 - p))
        for c in agree_cols:
            lm = lm + g[c] * _ln(m[c]) + (1.0 - g[c]) * _ln(1.0 - m[c])
            lu = lu + g[c] * _ln(u[c]) + (1.0 - g[c]) * _ln(1.0 - u[c])
        w = F.lit(1.0) / (F.lit(1.0) + F.exp(lu - lm))
        aggs = [F.sum(w).alias("__sw"), F.count("*").alias("__n")]
        for i, c in enumerate(agree_cols):
            aggs.append(F.sum(w * g[c]).alias(f"__m{i}"))
            aggs.append(F.sum((1.0 - w) * g[c]).alias(f"__u{i}"))
        row = pairs.agg(*aggs).collect()[0]
        sw, n = float(row["__sw"]), float(row["__n"])
        p = min(max(sw / n, lo), hi)
        for i, c in enumerate(agree_cols):
            m[c] = min(max(float(row[f"__m{i}"]) / max(sw, lo), lo), hi)
            u[c] = min(
                max(float(row[f"__u{i}"]) / max(n - sw, lo), lo), hi
            )
    out = [(c, m[c], u[c]) for c in agree_cols]
    out.append(("__prevalence__", p, p))
    return out

