"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup/quality (operators/dedup.py, text.py): benchmark
decontamination, deterministic mixture sampling, repetition statistics
(Gopher-style), PII redaction, and sequence packing.

All are JVM-expression implementations. Shuffle budget:

- :func:`decontaminate` — broadcast semi/anti joins: benchmark n-gram
  sets are MBs while the corpus is the 100 TB side, which is scanned
  (twice) but never shuffled.
- :func:`sample_mixture` — pure map: per-row hash threshold, so the
  sample is reproducible across runs, partitionings and cluster shapes
  (no sample()/limit() layout dependence).
- :func:`repetition_stats` — pure map: per-document line/n-gram
  statistics via higher-order array expressions.
- :func:`redact_pii` — pure map: a regexp_replace chain.
- :func:`pack_sequences` — ONE shuffle on a salted group key; the
  inherently-sequential running total runs per group, never globally.
- :func:`importance_weights` — two n_buckets-row histogram aggregates
  + broadcast ratio join; the corpus text never enters a shuffle.
- :func:`cap_per_source` — ONE window shuffle on the source key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquet_on_fhir_spark.operators.dedup import md5_60

#: md5_60 yields uniform integers in [0, 2^60): divide for a U[0,1) draw.
_HASH_SPACE = float(2**60)


def _word_ngrams(text_col: Column, n: int) -> Column:
    """Lower-cased word-level n-grams as strings (map-side only — one
    nested expression, no explode, no shuffle; empty/short docs yield
    an empty array).

    Built by ``zip_with``-ing the token array against its own k-shifted
    slices (k = 1..n−1) rather than ``transform``-ing per position:
    inside a higher-order lambda Catalyst INLINES the captured ``words``
    expression into every element evaluation, so the transform form
    re-ran ``split(lower(trim(text)))`` once per gram — O(tokens²)
    string work per document (measured 86 s → 15 s on the ×30 probe's
    7.8 M-gram explode). The zip form references ``words`` a constant
    ~2n times per ROW. ``zip_with`` null-pads the shorter (shifted)
    side and ``concat_ws`` skips nulls, so the tail entries are
    short grams — sliced off by the final ``slice(1, n_words−n+1)``.
    """
    words = F.split(F.lower(F.trim(text_col)), r"\s+")
    acc = words
    for k in range(1, n):
        shifted = F.slice(words, k + 1, F.size(words))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
    n_words = F.size(words)
    return F.when(n_words < n, F.array().cast("array<string>")).otherwise(
        F.slice(acc, 1, n_words - n + 1)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """Drop corpus documents sharing ≥ ``min_overlap`` word ``n``-grams
    with any benchmark document (test-set contamination removal; 13-gram
    matching is the common published setting).

    Plan — two clean corpus scans, zero corpus shuffles:

    1. benchmark → distinct gram frame (benchmarks are MBs; the corpus
       is the 100 TB side) → BROADCAST
    2. corpus → gram explode (a generator, map-side) → broadcast LEFT
       SEMI join → contaminated ids (the only shuffle: a distinct over
       the hit ids, which are few)
    3. corpus → broadcast LEFT ANTI join on the contaminated-id set.

    ``min_overlap>1`` swaps the distinct for a per-doc distinct-gram
    count ≥ k.
    """
    bench_grams = benchmark.select(
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram")
    ).distinct()
    hits = corpus.select(
        id_col, F.explode(_word_ngrams(F.col(text_col), n)).alias("gram")
    ).join(F.broadcast(bench_grams), "gram", "left_semi")
    if min_overlap <= 1:
        contaminated = hits.select(id_col).distinct()
    else:
        contaminated = (
            hits.groupBy(id_col)
            .agg(F.count_distinct("gram").alias("__hits"))
            .filter(F.col("__hits") >= min_overlap)
            .select(id_col)
        )
    return corpus.join(F.broadcast(contaminated), [id_col], "left_anti")


def sample_mixture(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling to a target mixture: keep each
    row of stratum ``k`` with probability ``weights[k]`` decided by a
    hash of (seed, id) — the same rows survive on any cluster layout,
    and disjoint seeds give disjoint-ish epochs. Rates > 1 are capped
    at 1 (upsampling needs row replication, not sampling).

    Map-only; the weights table is a literal CASE expression, not a join.
    """
    rate = F.lit(float(default_rate))
    for k, v in sorted(weights.items()):
        rate = F.when(F.col(key_col) == k, F.lit(min(float(v), 1.0))).otherwise(rate)
    draw = md5_60(
        F.concat_ws(":", F.lit(f"mix{seed}"), F.col(id_col).cast("string"))
    ) / F.lit(_HASH_SPACE)
    return df.filter(draw < rate)


def repetition_stats(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals as added columns:

    - ``dup_line_frac``: fraction of lines that are repeats of an
      earlier line (0 for single-line docs).
    - ``top_2gram_frac``: share of all word 2-grams taken by the most
      frequent one (sorted-run max over the 2-gram array — an
      ``aggregate`` fold, no per-row data structure).
    - ``word_count``: whitespace tokens.

    Pure expressions → whole-stage codegen; filter thresholds with
    :func:`repetition_filter`.
    """
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)
    dup_line_frac = F.when(n_lines <= 0, F.lit(0.0)).otherwise(
        (n_lines - F.size(F.array_distinct(lines))) / n_lines
    )
    grams = F.array_sort(_word_ngrams(F.col(text_col), 2))
    n_g = F.size(grams)
    # longest equal-run in the sorted array = max 2-gram multiplicity
    run_state = F.aggregate(
        grams,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
                .otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_frac = F.when(n_g <= 0, F.lit(0.0)).otherwise(run_state / n_g)
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        df.withColumn("dup_line_frac", dup_line_frac)
        .withColumn("top_2gram_frac", top_frac)
        .withColumn("word_count", F.size(words))
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_top_2gram_frac: float = 0.20,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Apply the standard repetition/length gates (published Gopher
    thresholds as defaults); returns surviving rows without the stat
    columns."""
    stats = repetition_stats(df, text_col)
    return stats.filter(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_2gram_frac") <= max_top_2gram_frac)
        & (F.col("word_count") >= min_words)
        & (F.col("word_count") <= max_words)
    ).drop("dup_line_frac", "top_2gram_frac", "word_count")


#: (pattern, replacement) — patterns restricted to a syntax evaluated
#: identically by Java regex (Spark) and RE2 (DuckDB, for the oracle):
#: no lookaround, no backreferences.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    # no leading \b: '(' has no word boundary against a preceding space
    (r"(\+?\d{1,2}[ .\-])?(\(\d{3}\)[ .\-]?|\d{3}[ .\-])\d{3}[ .\-]\d{4}\b", "[PHONE]"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace email/SSN/IPv4/US-phone shapes with typed placeholders —
    a regexp_replace chain (map-only)."""
    col = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col or text_col, col)


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    num_groups: int = 1024,
) -> DataFrame:
    """Lay documents out for LM-pretraining sequence packing: per group,
    documents concatenate (in id order) into one virtual token stream
    cut into ``max_tokens`` windows. Output columns: ``pack_group``,
    ``pack_bin`` (window holding the doc's FIRST token), ``pack_offset``
    (position inside that window), ``pack_spans`` (doc crosses into the
    next window — standard GPT-style packing lets it; a trainer that
    doesn't simply splits there).

    A single global running total would be a one-partition window — the
    classic scale killer — so documents are hashed into ``num_groups``
    independent streams and the cumulative sum runs WITHIN each group:
    with ~1k groups a 100 TB corpus packs with full parallelism, at the
    cost of one under-filled tail window per group (negligible against
    millions of windows). Deterministic: group and order depend only on
    ids.
    """
    toks = (
        F.col(token_col)
        if token_col
        else F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    ).cast("bigint")
    group = F.pmod(F.col(id_col).cast("bigint"), F.lit(int(num_groups)))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("pack_group")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cap = F.lit(int(max_tokens))
    start = F.col("__cum") - F.col("__tok")  # first-token stream position
    return (
        df.withColumn("__tok", toks)
        .withColumn("pack_group", group)
        .withColumn("__cum", F.sum("__tok").over(w))
        .withColumn("pack_bin", F.floor(start / cap).cast("bigint"))
        .withColumn(
            "pack_offset", (start - F.col("pack_bin") * cap).cast("bigint")
        )
        .withColumn(
            "pack_spans",
            F.when(
                F.col("__tok") > 0,
                F.floor((F.col("__cum") - 1) / cap) > F.col("pack_bin"),
            ).otherwise(F.lit(False)),
        )
        .drop("__tok", "__cum")
    )


def importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    smoothing: float = 1.0,
    hash_family: str = "md5_60",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score
    each corpus document by how target-like its hashed word-unigram
    distribution is —

        weight(d) = mean over words w of log(p_target[h(w)] / p_raw[h(w)])

    with Laplace-``smoothing`` on both bucket distributions.  Positive
    weight → more target-like than the raw corpus average.

    Shuffle budget: the two bucket histograms are ONE groupBy each over
    exploded words, aggregating to ``n_buckets`` rows (KBs) — then a
    BROADCAST join re-attaches the per-bucket log-ratio to the corpus
    words, and the per-doc mean groups on ``id_col`` ONLY (the text
    column never enters a shuffle; the final weight re-attaches to the
    corpus by an id equi-join).  No driver-side actions: the target
    word total rides along as a broadcast 1-row crossJoin.  (Published
    DSIR uses 10k-bucket hashed n-grams at web scale; the bucket table
    stays broadcast-size at any corpus size, which is the point of the
    hashing trick.)

    ``hash_family="md5_60"`` keeps the whole computation DuckDB-
    restatable; "xxhash64" is the faster production family.
    """
    from parquet_on_fhir_spark.operators.dedup import _seeded_hash

    bucket_of = lambda c: F.pmod(_seeded_hash(hash_family, 0)(c), F.lit(n_buckets))

    def word_buckets(df: DataFrame, *extra):
        words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        return df.select(*extra, F.explode(words).alias("__w")).filter(
            F.col("__w") != ""
        ).withColumn("__bucket", bucket_of(F.col("__w")))

    def histogram(df: DataFrame):
        h = word_buckets(df).groupBy("__bucket").agg(F.count("*").alias("__n"))
        tot = h.agg(F.sum("__n").alias("__tot"))
        return h.crossJoin(F.broadcast(tot))

    t_hist = histogram(target).select(
        "__bucket",
        ((F.col("__n") + smoothing) / (F.col("__tot") + smoothing * n_buckets)).alias(
            "__p_t"
        ),
        (F.col("__tot") + smoothing * n_buckets).alias("__denom_t"),
    )
    r_hist = histogram(corpus).select(
        "__bucket",
        ((F.col("__n") + smoothing) / (F.col("__tot") + smoothing * n_buckets)).alias(
            "__p_r"
        ),
    )
    # Buckets absent from the target histogram still get smoothed mass
    # smoothing/denom_t; denom_t rides along as a broadcast 1-row join.
    t_denom = t_hist.agg(F.max("__denom_t").alias("__dt"))
    ratios = (
        r_hist.join(t_hist.drop("__denom_t"), "__bucket", "left")
        .crossJoin(F.broadcast(t_denom))
        .select(
            "__bucket",
            F.log(
                F.coalesce(F.col("__p_t"), smoothing / F.col("__dt"))
                / F.col("__p_r")
            ).alias("__log_ratio"),
        )
    )
    scored = (
        word_buckets(corpus, id_col)
        .join(F.broadcast(ratios), "__bucket")
        .groupBy(id_col)
        .agg(F.avg("__log_ratio").alias("importance_weight"))
    )
    # Documents with zero words keep a row (weight 0) — no silent drops.
    return corpus.join(scored, [id_col], "left").withColumn(
        "importance_weight", F.coalesce("importance_weight", F.lit(0.0))
    )


def cap_per_source(
    df: DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    max_per_key: int = 100,
    order_col: str | None = None,
) -> DataFrame:
    """Keep at most ``max_per_key`` rows per source/domain — the standard
    anti-over-representation gate (a handful of boilerplate-heavy domains
    otherwise dominate a crawl corpus).

    One shuffle: ``row_number`` over (key) ordered by ``order_col`` desc
    (quality-first retention) then ``id_col`` for determinism.  Skewed
    domains are bounded by the cap itself — the window partition for a
    domain never materializes more than its input, and pathological
    single-domain skew is exactly what the cap is deleting; for
    degenerate cases (one domain = half the corpus) pre-filter with a
    sampled count and :func:`sample_mixture` instead.
    """
    order = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if order_col
        else [F.col(id_col).asc()]
    )
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_key)
        .drop("__rn")
    )


def split_corpus(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test assignment: a hash of (seed, id)
    maps to a U[0,1) draw, cut by the cumulative weights (dict order).
    Pure map — the same row lands in the same split on any cluster
    layout, any partitioning, any run; changing ``seed`` re-deals.
    Weights are normalized, so {9, 0.5, 0.5} and {0.9, 0.05, 0.05}
    agree.  Adds a ``split`` column.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if any(v < 0 for v in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("split weights must be non-negative with a positive sum")
    total = float(sum(weights.values()))
    draw = md5_60(
        F.concat_ws(":", F.lit(f"split{seed}"), F.col(id_col).cast("string"))
    ) / F.lit(_HASH_SPACE)
    names = list(weights)
    cum = 0.0
    expr = F.lit(names[-1])  # everything past the last boundary
    boundaries = []
    for name in names[:-1]:
        cum += float(weights[name]) / total
        boundaries.append((name, cum))
    for name, b in reversed(boundaries):
        expr = F.when(draw < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def ngram_lm_score(
    df: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.1,
) -> DataFrame:
    """CCNet-style fluency scoring (Wenzek et al., LREC 2020): per-doc
    mean negative log2 probability under an add-k-smoothed BIGRAM
    language model trained on ``reference`` — the perplexity-proxy used
    to keep the "head" (low score = fluent / in-domain) of a crawl.

    Model: P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V), V = reference
    unigram vocabulary size. score(doc) = -mean log2 P over its bigrams;
    documents with < 2 tokens score NULL.

    100 TB shape: the reference side aggregates once (bigram counts +
    context counts + a 1-row V scalar) and every model table enters the
    scoring join BROADCAST — a reference corpus of millions of distinct
    bigrams is a few hundred MB, the classic broadcast-dimension case.
    The scored corpus explodes to bigrams map-side, hits the two
    broadcast hash joins with zero shuffle, and the per-doc mean is a
    hash aggregate with map-side partial combine (shuffle rows ≈ number
    of documents, never number of bigrams). Text itself is never
    shuffled. For a reference too big to broadcast, drop the
    ``F.broadcast`` hints and the joins degrade to shuffle joins keyed
    on the gram — same plan class as tf-idf.

    Output: (id_col, n_bigrams, lm_score).
    """
    def bigrams(col: Column) -> Column:
        return _word_ngrams(col, 2)

    ref_grams = reference.select(
        F.explode(bigrams(F.col(text_col))).alias("gram")
    )
    bigram_counts = ref_grams.groupBy("gram").agg(F.count("*").alias("c2"))
    context_counts = (
        ref_grams.select(
            F.split(F.col("gram"), " ").getItem(0).alias("w1")
        )
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vocab = reference.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    ).agg(F.countDistinct("w").alias("V"))

    doc_grams = df.select(
        F.col(id_col),
        F.explode(bigrams(F.col(text_col))).alias("gram"),
    ).withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
    scored = (
        doc_grams.join(F.broadcast(bigram_counts), "gram", "left")
        .join(F.broadcast(context_counts), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log2(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("V"))
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        (-F.avg("logp")).alias("lm_score"),
    )
    # docs with <2 tokens have no bigrams: reattach with NULL score
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.col("lm_score"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of ``k`` rows (per
    group when ``group_col`` is set) — Efraimidis–Spirakis A-ES: each
    row draws key ``u^(1/w)`` for a uniform ``u`` and the top-k keys
    are exactly a weighted sample without replacement. ``u`` derives
    from a hash of (seed, id), so the SAME rows are chosen on any
    cluster layout, any partitioning, any run — and the selection is
    restatable in the oracle, unlike ``rand()``-based sampling.

    Zero/negative weights are excluded. Cost: one map pass to draw
    keys + one top-k (window per group, or TakeOrderedAndProject when
    ungrouped) — never a full sort of the corpus.

    Implementation note: keys compare as ``log(u)/w`` (monotone in
    ``u^(1/w)``) — numerically stabler for tiny weights and exactly
    reproducible in SQL (both engines evaluate ``ln`` on identical
    doubles). Larger is better; ties broken by id.
    """
    u = (
        md5_60(F.concat_ws(":", F.lit(f"ws{seed}"), F.col(id_col).cast("string")))
        + F.lit(1)
    ) / F.lit(_HASH_SPACE)  # (0, 1]: +1 shift avoids log(0)
    key = F.log(u) / F.col(weight_col)
    from pyspark.sql import Window

    out = df.filter(F.col(weight_col) > 0).withColumn("__wkey", key)
    if group_col is None:
        return (
            out.orderBy(F.desc("__wkey"), F.col(id_col))
            .limit(k)
            .drop("__wkey")
        )
    w = Window.partitionBy(group_col).orderBy(F.desc("__wkey"), F.col(id_col))
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__wkey", "__rn")
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    n: int = 13,
) -> DataFrame:
    """The audit counterpart of :func:`decontaminate`: WHICH benchmark
    items leak into WHICH corpus documents, with the shared distinct
    ``n``-gram count — what a contamination review actually reads
    before deciding thresholds (and the evidence trail for reporting
    benchmark hygiene).

    Same cost shape as decontaminate: the benchmark side explodes to a
    (gram, bench_id) frame and BROADCASTS; the corpus explodes map-side
    and the join emits only colliding (corpus_id, bench_id, gram)
    triples — shuffle volume is the collision set, not the corpus. One
    hash aggregate counts distinct shared grams per pair.

    Output: (corpus_id, bench_id, n_shared_ngrams), descending.
    """
    bench_grams = benchmark.select(
        F.col(bench_id),
        F.explode(_word_ngrams(F.col(text_col), n)).alias("gram"),
    ).distinct()
    corpus_grams = corpus.select(
        F.col(corpus_id),
        F.explode(F.array_distinct(_word_ngrams(F.col(text_col), n))).alias("gram"),
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(corpus_id, bench_id)
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def classifier_score(
    df: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    text_col: str = "text",
    out_col: str = "clf_score",
    seed: int = 0,
    hash_family: str = "md5_60",
) -> DataFrame:
    """Hashed bag-of-words linear classifier scoring — the serving shape
    of a fastText-style quality/domain classifier (Joulin et al. 2016,
    "Bag of Tricks for Efficient Text Classification") applied at corpus
    scale: token → hash bucket → learned weight; document score =
    sigmoid(bias + mean bucket weight).

    The trained model is just ``weights`` (n_buckets floats) + ``bias``
    and enters the plan as an ARRAY LITERAL, so scoring is a pure map
    over the corpus — no join, no shuffle, no Python, one scan at
    100 TB. The token array is let-bound (1-element-array transform, see
    :func:`~parquet_on_fhir_spark.operators.dedup.shingles`) so the
    split runs once per document, not once per token.

    ``hash_family="md5_60"`` buckets with the cross-engine portable
    hash, making the whole scorer restatable in ANSI SQL (oracle
    ``q144``); pass ``"xxhash64"`` for production sweeps (~3× faster,
    Spark-only).
    """
    n = len(weights)
    arr = F.array(*[F.lit(float(w)) for w in weights])
    prefix = f"clf{seed}"
    if hash_family == "md5_60":
        h = md5_60
    elif hash_family == "xxhash64":
        h = F.xxhash64
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    def per_toks(ts):
        total = F.aggregate(
            ts,
            F.lit(0.0),
            lambda acc, w: acc
            + F.element_at(
                arr,
                (h(F.concat_ws(":", F.lit(prefix), w)) % n + 1).cast("int"),
            ),
        )
        return F.lit(float(bias)) + total / F.greatest(F.size(ts), F.lit(1))

    score = F.transform(F.array(words), per_toks)[0]
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-score)))


def temperature_mixture(
    df: DataFrame,
    budget: int,
    alpha: float = 0.5,
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-scaled source mixture — the multilingual / Pile
    recipe (Conneau & Lample 2019 §3.1): sampling mass per source ∝
    n_k^alpha with alpha < 1, flattening the natural distribution
    toward small sources; ``budget`` is the target total row count.

    Per-source keep rate r_k = min(1, budget · n_k^alpha / Σ_j n_j^alpha
    / n_k); rows survive by the same deterministic per-row hash
    threshold as :func:`sample_mixture`, so the sample is reproducible
    across cluster layouts. The rate is quantized to 12 dp before the
    comparison: Σ n^alpha is a float sum whose last bit depends on
    aggregation order, and quantizing makes keep/drop decisions
    order-independent (and ANSI-SQL-restatable — oracle ``q145``).

    Cost: one K-row count aggregate, one 1-row total, a BROADCAST join
    of the K rates, and a map-side filter — the corpus shuffles nothing.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    counts = counts.withColumn(
        "_w", F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
    )
    total = counts.agg(F.sum("_w").alias("_tw"))
    rates = counts.crossJoin(F.broadcast(total)).select(
        key_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(budget)) * F.col("_w") / F.col("_tw") / F.col("_n"),
            ),
            12,
        ).alias("_rate"),
    )
    draw = md5_60(
        F.concat_ws(":", F.lit(f"temp{seed}"), F.col(id_col).cast("string"))
    ) / F.lit(_HASH_SPACE)
    return df.join(F.broadcast(rates), key_col).filter(draw < F.col("_rate")).drop(
        "_rate"
    )


def soft_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Duplicate-aware DOWN-WEIGHTING instead of deletion: a document
    with n exact copies survives with probability 1/n, so the expected
    surviving count per distinct text is exactly 1 while WHICH copy
    survives stays randomized across the corpus — the softer
    alternative to hard dedup when duplication frequency itself is a
    (weak) quality signal the mixture should not fully erase.

    One hash aggregate on sha-of-text for copy counts (text itself is
    never shuffled — same discipline as exact_dedup), joined back on
    the digest, then a deterministic per-(seed, id) U[0,1) draw cut at
    1/n. Layout-independent and restatable in SQL (md5_60 family).

    Output: the surviving rows of ``df`` plus ``n_copies``.
    """
    from parquet_on_fhir_spark.operators.dedup import md5_60

    digest = F.sha2(F.col(text_col), 256)
    counts = (
        df.select(digest.alias("__dg"))
        .groupBy("__dg")
        .agg(F.count("*").alias("n_copies"))
    )
    keyed = df.withColumn("__dg", digest).join(counts, "__dg")
    draw = md5_60(
        F.concat_ws(":", F.lit(f"soft{seed}"), F.col(id_col).cast("string"))
    ) / F.lit(float(_HASH_SPACE))
    return keyed.filter(draw < 1.0 / F.col("n_copies")).drop("__dg")


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """PMI-ranked adjacent-bigram collocations — phrase-vocabulary
    induction (the statistical step under phrase-aware tokenizers):
    PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) over adjacent token pairs,
    thresholded to ``min_count`` occurrences (PMI of rare pairs is
    noise by construction).

    One explode for unigram counts, one for adjacent bigrams (n−1
    pairs per doc — linear, not the quadratic all-pairs co-occurrence),
    two broadcast joins of the unigram table onto the bigram table,
    top-k by (PMI, pair). The corpus is scanned twice, shuffled only
    at vocabulary cardinality.

    Output: (w1, w2, n_pair, pmi, rank) — rank 1..k by PMI desc.
    """
    from pyspark.sql import Window

    toks = F.split(F.col(text_col), " ")
    words = df.select(F.explode(toks).alias("w")).filter(F.col("w") != "")
    uni = words.groupBy("w").agg(F.count("*").alias("nw"))
    n_tokens = uni.agg(F.sum("nw").alias("nt"))
    pairs = (
        df.select(
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                    F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_pair"))
    n_pairs = bi.agg(F.sum("n_pair").alias("np"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("nw").alias("n1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("nw").alias("n2"))
    scored = (
        bi.filter(F.col("n_pair") >= min_count)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_tokens))
        .crossJoin(F.broadcast(n_pairs))
        .withColumn(
            "pmi",
            F.log(
                (F.col("n_pair") / F.col("np"))
                / ((F.col("n1") / F.col("nt")) * (F.col("n2") / F.col("nt")))
            ),
        )
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("w1", "w2", "n_pair", "pmi", "rank")
    )


def interleave_sources(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic anti-clumping curriculum order: documents are
    dealt round-robin across sources (every source's k-th document
    lands in the k-th block), with hash-shuffled order inside each
    source — the "interleave the mixture" step before sequence packing
    so a training stream never sees long single-source runs, without a
    global random sort.

    100 TB plan: ONE shuffle keyed by source (the per-source
    ``row_number`` window); the global position is then computed
    arithmetically from a K-row broadcast of per-source counts — a
    row in round ``r`` from source ``s`` sits after the
    ``sum_s' min(r, n_s')`` documents of earlier rounds plus the
    sources that deal before ``s`` inside round ``r`` (those with
    ``n_s' > r`` and a smaller source draw). No unpartitioned window
    anywhere, so the corpus is never funneled through one task
    (tests/test_scale_plans.py asserts this on the optimized plan).
    Layout-independent: position depends only on (seed, ids, sources).

    Output: input columns + ``position`` (0-based global order).
    """
    from pyspark.sql import Window

    from parquet_on_fhir_spark.operators.dedup import md5_60

    draw = md5_60(
        F.concat_ws(":", F.lit(f"il{seed}"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(source_col).orderBy(draw, F.col(id_col))
    sdraw = md5_60(
        F.concat_ws(":", F.lit(f"ils{seed}"), F.col(source_col).cast("string"))
    )
    ranked = df.withColumn("__round", F.row_number().over(w) - 1).withColumn(
        "__sdraw", sdraw
    )
    # K-row broadcast: every source's (draw, name, count), sorted so the
    # struct order IS the intra-round deal order.
    src = F.col(source_col).cast("string")
    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    tbl = counts.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    sdraw.alias("d"), src.alias("s"), F.col("__n").alias("n")
                )
            )
        ).alias("__tbl")
    )
    r = F.col("__round").cast("long")
    earlier_rounds = F.aggregate(
        "__tbl", F.lit(0).cast("long"), lambda acc, x: acc + F.least(x["n"], r)
    )
    deals_before = F.size(
        F.filter(
            "__tbl",
            lambda x: (x["n"] > r)
            & (
                (x["d"] < F.col("__sdraw"))
                | ((x["d"] == F.col("__sdraw")) & (x["s"] < src))
            ),
        )
    ).cast("long")
    return (
        ranked.join(F.broadcast(tbl))
        .withColumn("position", (earlier_rounds + deals_before).cast("int"))
        .drop("__round", "__sdraw", "__tbl")
    )


def stratified_folds(
    df: DataFrame,
    id_col: str,
    k: int,
    strata_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment, optionally
    stratified: within each stratum, documents are dealt round-robin
    over a hash-shuffled order, so every fold holds ⌈n_s/k⌉ or
    ⌊n_s/k⌋ rows of stratum s — the balanced-fold guarantee plain
    ``hash % k`` only gives in expectation. Layout-independent:
    assignment depends only on (seed, ids, strata).

    One window shuffle keyed by the strata (per-stratum hash rank, the
    same shape as interleave_sources); no global window, no action.
    With ``strata_cols=None`` the hash-mod tier is used instead — a
    pure map with NO shuffle at all (the right default at 100 TB when
    ±√n fold-size jitter is acceptable).

    Output: input columns + ``fold`` (0..k-1).
    """
    from pyspark.sql import Window

    from parquet_on_fhir_spark.operators.dedup import md5_60

    draw = md5_60(
        F.concat_ws(":", F.lit(f"fold{seed}"), F.col(id_col).cast("string"))
    )
    if not strata_cols:
        return df.withColumn("fold", (draw % k).cast("int"))
    w = Window.partitionBy(*strata_cols).orderBy(draw, F.col(id_col))
    return df.withColumn(
        "fold", ((F.row_number().over(w) - 1) % k).cast("int")
    )


def weighted_sample_wor(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis
    exponential keys: each row draws u ~ U(0,1) deterministically from
    md5(seed:id) and the k rows with the largest u^(1/w) — equivalently
    the largest ln(u)/w, the monotone form computed here — are the
    sample. One pass, no per-round rejection loop, provably the
    weighted-WOR distribution (Efraimidis & Spirakis 2006); the
    standard way to draw a quality-weighted training subset where
    ``df.sample`` (Bernoulli, unweighted) cannot.

    Plan: a map-side key computation followed by ORDER BY + LIMIT k,
    which Spark executes as TakeOrdered (per-partition top-k heaps +
    a k-row merge) — no global sort shuffle, no window. The md5 draw
    makes the exact sample SQL-restatable cross-engine. Rows with
    NULL or non-positive weight are excluded (they have zero selection
    probability in the WOR scheme; an explicit filter beats a NaN key).

    Output: the k sampled input rows + ``sample_key`` (the ln(u)/w
    draw, for audit/reproducibility).
    """
    u = (
        md5_60(
            F.concat_ws(
                ":", F.lit(f"ws{seed}"), F.col(id_col).cast("string")
            )
        )
        + F.lit(1)
    ) / F.lit(float(2**60))
    keyed = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("sample_key", F.ln(u) / F.col(weight_col))
    return keyed.orderBy(
        F.col("sample_key").desc(), F.col(id_col)
    ).limit(k)


def weighted_sample_wor_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Stratified weighted sampling without replacement (r12): the
    Efraimidis–Spirakis draw of :func:`weighted_sample_wor`, but the
    top-k selection runs PER GROUP — the training-mixture primitive
    ("at most k docs per source/domain/language, weighted by quality")
    that a global top-k cannot express and per-group loops would run
    G jobs for.

    Plan: the same map-side deterministic md5 key, then ONE
    row_number window partitioned by the group — a single shuffle on
    the group key with per-partition top-k semantics; groups are
    processed independently, so skewed group sizes cost only their own
    partitions. The md5 draw keeps the exact sample SQL-restatable.
    NULL groups are kept as their own stratum (the SQL twin must
    partition the same way); NULL/non-positive weights are excluded.

    Output: the ≤k sampled rows per group + ``sample_key``.
    """
    from pyspark.sql import Window

    u = (
        md5_60(
            F.concat_ws(
                ":", F.lit(f"wsg{seed}"), F.col(id_col).cast("string")
            )
        )
        + F.lit(1)
    ) / F.lit(float(2**60))
    keyed = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("sample_key", F.ln(u) / F.col(weight_col))
    w = Window.partitionBy(group_col).orderBy(
        F.col("sample_key").desc(), F.col(id_col)
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


#: Query parameters that carry tracking/session state, not content
#: identity.  Part of the operator contract — the oracle twin filters
#: the SAME set: these exact names plus the ``utm_`` prefix family.
TRACKING_PARAMS = (
    "fbclid",
    "gclid",
    "msclkid",
    "mc_eid",
    "igshid",
    "ref_src",
    "s_kwcid",
)


def canonicalize_url(url: Column, *, strip_www: bool = True) -> Column:
    """Canonical form of an absolute http(s) URL — the crawl-pipeline
    URL-dedup key (two fetches of the same resource differ by tracking
    params, host case, default ports, fragments and slash noise;
    crawl curation dedups on the canonicalized URL before any content
    dedup runs, because it needs no fetch of the body at all).

    Pure Catalyst (regexp + higher-order array expressions — a
    map-only projection, no UDF, no shuffle), so at 100 TB it rides
    the scan.  Steps, in order (each mirrored in the DuckDB oracle):

    1. trim; drop the ``#fragment``;
    2. scheme lower-cased; ``://`` splits authority from path+query;
    3. host lower-cased; leading ``www.`` stripped (option); default
       ports ``:80`` (http) / ``:443`` (https) dropped, others kept;
    4. path: duplicate ``//`` collapsed, trailing ``/`` stripped
       (empty path → ``/``);
    5. query: split on ``&``, empty items and tracking params removed
       (:data:`TRACKING_PARAMS` + the ``utm_`` prefix family), the
       remainder sorted bytewise and re-joined — parameter order is
       transport noise, not identity.

    Non-http(s) / scheme-less input is returned trimmed-only: audit
    queries route those to a quarantine bucket rather than crash.
    """
    s = F.regexp_replace(F.trim(url), "#.*$", "")
    scheme = F.lower(
        F.regexp_extract(s, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    after = F.regexp_replace(s, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    authority = F.regexp_extract(after, r"^([^/?]*)", 1)
    # default-port strip is scheme-conditional; other ports kept verbatim
    host = F.when(
        scheme == "http",
        F.regexp_replace(F.lower(authority), ":80$", ""),
    ).otherwise(
        F.when(
            scheme == "https",
            F.regexp_replace(F.lower(authority), ":443$", ""),
        ).otherwise(F.lower(authority))
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    pathq = F.substring(after, F.length(authority) + 1, F.length(after))
    raw_path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(raw_path, "/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            F.substring(path, 1, F.length(path) - 1),
        ).otherwise(path)
    )
    query = F.when(
        pathq.contains("?"),
        F.substring(
            pathq,
            F.length(raw_path) + 2,
            F.length(pathq),
        ),
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda x: (x != "")
        & ~x.startswith("utm_")
        & ~F.split(x, "=").getItem(0).isin(*TRACKING_PARAMS),
    )
    canon_q = F.concat_ws("&", F.array_sort(kept))
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), canon_q)
        ),
    )
    return F.when(scheme.isin("http", "https"), rebuilt).otherwise(
        F.trim(url)
    )


def url_dedup_audit(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """URL-level duplicate clusters: canonicalize, group, report every
    canonical URL fetched under more than one raw variant (the keeper
    is the min id — the same keep-first discipline as exact_dedup).

    ONE hash aggregate on the canonical key (map-side combined); the
    document bodies never move — this is exactly why crawl pipelines
    run URL dedup first at 100 TB: it prices per URL string, not per
    payload.
    """
    canon = df.select(
        F.col(id_col),
        F.col(url_col).alias("raw_url"),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.countDistinct("raw_url").alias("n_distinct_raw"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n_variants") > 1)
    )


def luhn_check(num: Column) -> Column:
    """Luhn checksum validation of a digit string (ISO/IEC 7812 — the
    check every real payment-card number passes): doubling every
    second digit from the right, subtracting 9 above 9, total ≡ 0
    (mod 10).  Pure Catalyst (reverse + transform + aggregate over the
    digit positions — no UDF); NULL/empty/non-digit input → false.

    This is the PRECISION layer over regex PII detection: a 16-digit
    match is a card-number CANDIDATE, but only ~1 in 10 random digit
    strings passes Luhn — validating before redacting/reporting cuts
    the false-positive flood that makes naive PII audits unusable.
    """
    rev = F.reverse(num)

    def digit(i):
        return F.ascii(rev.substr(i + 1, F.lit(1))) - 48

    terms = F.transform(
        F.sequence(F.lit(0), F.length(rev) - 1),
        lambda i: F.when(
            i % 2 == 1,
            F.when(digit(i) * 2 > 9, digit(i) * 2 - 9).otherwise(
                digit(i) * 2
            ),
        ).otherwise(digit(i)),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return (
        num.isNotNull()
        & (F.length(num) > 0)
        & num.rlike("^[0-9]+$")
        & (total % 10 == 0)
    )


def sniff_mime(content: bytes) -> str:
    """Magic-byte content sniffing (the crawl reality: Content-Type
    headers lie). Recognizes the formats this package decodes plus the
    common container/archive magics; falls back to a printable-ratio
    text/binary split over the first KiB."""
    b = bytes(content[:16])
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if b.startswith(b"\xff\xd8"):
        return "image/jpeg"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if b[:4] == b"RIFF" and content[8:12] == b"WEBP":
        return "image/webp"
    if b[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "audio/wav"
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return "image/tiff"
    if content[4:12] == b"ftypavif":
        return "image/avif"
    if b.startswith(b"%PDF"):
        return "application/pdf"
    if b.startswith(b"PK\x03\x04"):
        return "application/zip"
    if b.startswith(b"\x1f\x8b"):
        return "application/gzip"
    if b.startswith(b"\x28\xb5\x2f\xfd"):
        return "application/zstd"
    if b.startswith(b"P6"):
        return "image/x-portable-pixmap"
    if b.startswith(b"BM"):
        return "image/bmp"
    head = bytes(content[:1024])
    low = head.lstrip()[:64].lower()
    if low.startswith((b"<!doctype html", b"<html")):
        return "text/html"
    if head:
        printable = sum(
            1 for c in head if 32 <= c < 127 or c in (9, 10, 13)
        )
        if printable / len(head) >= 0.95:
            return "text/plain"
    return "application/octet-stream"


def mime_sniff_audit(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    claimed_col: str = "claimed_mime",
) -> DataFrame:
    """Per-payload claimed-vs-sniffed content-type audit: the
    mislabeled-payload rate is a standard crawl-quality metric, and a
    pipeline that routes payloads by the CLAIMED type feeds binaries
    to text stages. Pure Catalyst is impossible here only for the
    printable-ratio fallback, so the sniff runs in the usual
    Arrow-batched ``mapInPandas`` pass. Output: inputs + sniffed_mime
    + mismatch (claimed != sniffed, NULL claimed ⇒ NULL mismatch)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            sniffed = [
                sniff_mime(bytes(c)) for c in pdf[content_col]
            ]
            out = pdf[[id_col, claimed_col]].copy()
            out["sniffed_mime"] = pd.Series(sniffed, dtype="object")
            yield out

    out = media.select(id_col, claimed_col, content_col).mapInPandas(
        batches,
        schema=f"{id_col} long, {claimed_col} string, sniffed_mime string",
    )
    return out.withColumn(
        "mismatch",
        F.when(
            F.col(claimed_col).isNotNull(),
            F.col(claimed_col) != F.col("sniffed_mime"),
        ),
    )


def compressed_payload_audit(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_out_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Compressed-payload ingestion audit with a DECOMPRESSION-BOMB
    guard (r13): crawled archives carry gzip/zlib/raw-deflate blobs,
    and a 100 TB pipeline must (a) detect what a payload is from magic
    bytes, (b) size the decompressed text WITHOUT materializing
    unbounded output — a 42-byte zip-bomb classic expands to
    petabytes, so decompression runs through ``decompressobj`` with a
    hard ``max_out_bytes`` cap per payload and reports ``truncated``
    instead of dying.

    Detection: gzip (1f 8b), zlib (78 01/5e/9c/da with a valid FCHECK),
    zstd (28 b5 2f fd — detect-only, no stdlib codec: ``codec``
    reported, out_len NULL), otherwise 'raw' (stored as-is, out_len =
    payload size). Runs per payload in Arrow-batched ``mapInPandas``
    (the codec-family shape). Output: (id, codec, in_len, out_len,
    ratio, truncated)."""
    import pandas as pd

    def _detect(b: bytes) -> str:
        if len(b) >= 2 and b[0] == 0x1F and b[1] == 0x8B:
            return "gzip"
        if len(b) >= 4 and b[:4] == b"\x28\xb5\x2f\xfd":
            return "zstd"
        if (
            len(b) >= 2
            and (b[0] & 0x0F) == 8
            and ((b[0] << 8) | b[1]) % 31 == 0
        ):
            return "zlib"
        return "raw"

    def _bounded_inflate(b: bytes, wbits: int):
        """(out_len, truncated); (None, False) on corrupt streams.
        At most 1 MiB of output materializes per step and the running
        total is capped — the bomb never allocates its payload."""
        import zlib

        d = zlib.decompressobj(wbits)
        out_len = 0
        buf = b
        try:
            while buf and not d.eof:
                chunk = d.decompress(buf, 1 << 20)
                out_len += len(chunk)
                if out_len > max_out_bytes:
                    return max_out_bytes, True
                buf = d.unconsumed_tail
                if not chunk and not buf:
                    break
            if not d.eof:
                return None, False  # input ended mid-stream: corrupt
            return out_len, False
        except Exception:
            return None, False

    def batches(it):
        for pdf in it:
            ids, codecs, in_lens, out_lens, trunc = [], [], [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content)
                codec = _detect(b)
                ids.append(mid)
                codecs.append(codec)
                in_lens.append(len(b))
                if codec == "gzip":
                    o, tr = _bounded_inflate(b, 16 + 15)
                elif codec == "zlib":
                    o, tr = _bounded_inflate(b, 15)
                elif codec == "zstd":
                    o, tr = None, False
                else:
                    o, tr = len(b), False
                out_lens.append(o)
                trunc.append(tr)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "codec": pd.Series(codecs, dtype="object"),
                    "in_len": pd.Series(in_lens, dtype="int64"),
                    "out_len": pd.Series(out_lens, dtype="Int64"),
                    "truncated": pd.Series(trunc, dtype="bool"),
                }
            )

    out = media.select(
        F.col(id_col).alias(id_col), F.col(content_col).alias(content_col)
    ).mapInPandas(
        batches,
        schema=(
            "media_id long, codec string, in_len long, out_len long, "
            "truncated boolean"
        ),
    )
    return out.withColumn(
        "ratio",
        F.when(
            F.col("out_len").isNotNull() & (F.col("in_len") > 0),
            F.round(F.col("out_len") / F.col("in_len"), 4),
        ),
    )


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    blocklist: tuple = ("badword1", "badword2"),
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """C4-style heuristic cleaning (r14 wave 3; Raffel et al. 2020
    §2.2 — the rule set behind the Colossal Clean Crawled Corpus,
    still the reference cleaning recipe for web text):

    line level (drop the line):
      - doesn't end in terminal punctuation (``. ! ? "``),
      - fewer than ``min_words_per_line`` words,
      - contains the word "javascript" (case-insensitive);
    page level (drop the page, ``reason`` says why, first match wins):
      - ``null_text`` — a NULL page (checked first so the later
        NULL-propagating predicates can't silently pass it),
      - ``blocklist`` — any listed word, word-boundary, lowercased
        (the public recipe uses the "Dirty, Naughty…" list; pass your
        own — the default is a placeholder),
      - ``lorem_ipsum`` — the classic template marker,
      - ``brace`` — a ``{`` anywhere (code, not prose),
      - ``too_few_sentences`` — fewer than ``min_sentences``
        terminal-punctuation marks in the CLEANED text.

    PURE Catalyst: split + higher-order ``filter`` with regexp line
    predicates, ``regexp_count`` for sentences — a map-only
    projection riding the scan, zero python per page. Output: inputs'
    id + (n_lines, n_kept_lines, n_sentences, clean_len, reason,
    kept); ``clean_text`` carries the kept lines for downstream
    stages."""
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def good_line(l):
        words = F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda x: x != ""))
        return (
            l.rlike(r'[.!?"]\s*$')
            & (words >= min_words_per_line)
            & ~F.lower(l).contains("javascript")
        )

    kept_lines = F.filter(lines, good_line)
    clean = F.array_join(kept_lines, "\n")
    blocked = F.lower(t).rlike(
        r"\b(" + "|".join(blocklist) + r")\b"
    ) if blocklist else F.lit(False)
    out = (
        df.withColumn("__clean", clean)
        .withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(kept_lines))
        .withColumn(
            "n_sentences", F.expr("regexp_count(__clean, '[.!?]')")
        )
        .withColumn(
            "reason",
            # NULL text first (r14 advice): every later predicate
            # evaluates to NULL on a null page, which would leave
            # reason NULL and kept TRUE — a null page must fail the
            # gate deterministically instead.
            F.when(t.isNull(), "null_text")
            .when(blocked, "blocklist")
            .when(F.lower(t).contains("lorem ipsum"), "lorem_ipsum")
            .when(t.contains("{"), "brace")
            .when(F.col("n_sentences") < min_sentences, "too_few_sentences"),
        )
        .withColumn("kept", F.col("reason").isNull())
        .withColumn("clean_len", F.length("__clean"))
        .withColumnRenamed("__clean", "clean_text")
    )
    return out.select(
        id_col, "n_lines", "n_kept_lines", "n_sentences", "clean_len",
        "reason", "kept", "clean_text",
    )
