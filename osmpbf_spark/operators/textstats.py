"""SURVEY.md §2C — text analysis over ``documents``: token counting,
language-ID heuristic, quality scoring, document fingerprinting.

Everything here is built-in JVM expressions (split/regexp/aggregate — zero
Python UDFs), so every query carries a full DuckDB oracle and the plans are
single-pass projections or one bounded-key aggregation: at 100 TB these are
scan-dominated map-only jobs (or shuffle-by-#groups), the cheapest shape
Spark has.

The language-ID heuristic scores stopword-profile overlap per language and
argmaxes. On the driver's synthetic corpus every document draws from the
same English-ish vocabulary regardless of its ``lang`` label, so predictions
are uniform — the oracle checks the scoring machinery deterministically, not
real-world accuracy (which this corpus cannot measure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osmpbf_spark.catalog import fanout, load, query

# stopword profiles for the n-gram/stopword language heuristic
_PROFILES = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "et", "un", "est"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "und", "ein", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # romanized placeholders
}
_LANGS = sorted(_PROFILES)  # deterministic argmax tie-break order


def _score_exprs_spark():
    return [
        F.size(
            F.array_intersect(
                "w", F.array(*[F.lit(s) for s in _PROFILES[lang]])
            )
        ).alias(f"score_{lang}")
        for lang in _LANGS
    ]


def _argmax_spark():
    """greatest-score language with alphabetical tie-break: fold over the
    sorted language list keeping the first strict maximum."""
    expr = F.lit(_LANGS[0])
    best = F.col(f"score_{_LANGS[0]}")
    for lang in _LANGS[1:]:
        cond = F.col(f"score_{lang}") > best
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
        best = F.when(cond, F.col(f"score_{lang}")).otherwise(best)
    return expr


def _sql_scores(alias: str) -> str:
    return ", ".join(
        f"len(list_intersect({alias}.w, {list(_PROFILES[lang])!r})) AS score_{lang}"
        for lang in _LANGS
    )


def _sql_argmax() -> str:
    expr = f"'{_LANGS[0]}'"
    best = f"score_{_LANGS[0]}"
    for lang in _LANGS[1:]:
        expr = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"greatest(score_{lang}, {best})"
    return expr


@query(
    "q_text_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+')) AS n_alpha_tokens,
           length(text) AS n_chars,
           len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
           ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS avg_token_len
    FROM documents
    """,
    tags=("text",),
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + alphabetic-regex), char counts, distinct
    ratio. Map-only projection: at 100 TB this is one scan, no shuffle."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)).alias(
            "n_alpha_tokens"
        ),
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(F.array_distinct(F.split(F.lower("text"), " "))).alias("n_uniq"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
                "double"
            )
            / F.size(w),
            6,
        ).alias("avg_token_len"),
    )


@query(
    "q_text_lang",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w
               FROM documents),
         s AS (SELECT doc_id, lang, {_sql_scores('d')} FROM d)
    SELECT lang, {_sql_argmax()} AS predicted, COUNT(*) AS n_docs
    FROM s GROUP BY lang, predicted
    """,
    tags=("text",),
)
def q_text_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: score overlap with each language's
    stopword set, argmax with deterministic tie-break, then the (label x
    prediction) agreement matrix. Aggregation keys bounded by 25 lang
    pairs — shuffle volume is constant regardless of corpus size."""
    d = load(spark, sf_dir, "documents").withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    scored = d.select("doc_id", "lang", *_score_exprs_spark())
    return (
        scored.withColumn("predicted", _argmax_spark())
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "q_text_quality",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(len(list_intersect(string_split(lower(text), ' '),
                                     ['the', 'a', 'of', 'and', 'is'])) AS DOUBLE)
               / len(list_distinct(string_split(lower(text), ' '))) AS stop_ratio,
             CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS uniq_ratio
      FROM documents)
    SELECT doc_id,
           ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.4
                 + LEAST(stop_ratio * 5, 1.0) * 0.2
                 + uniq_ratio * 0.4, 6) AS quality,
           CASE WHEN ROUND(LEAST(n_tokens / 100.0, 1.0) * 0.4
                 + LEAST(stop_ratio * 5, 1.0) * 0.2
                 + uniq_ratio * 0.4, 6) >= 0.5 THEN 'keep' ELSE 'drop' END AS verdict
    FROM s
    """,
    tags=("text",),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score (length + stopword presence + lexical
    diversity) with a keep/drop verdict — the filter stage of a training-
    data pipeline. Map-only; ratios rounded so the hash is stable."""
    d = load(spark, sf_dir, "documents")
    wl = F.split(F.lower("text"), " ")
    n_tokens = F.size(F.split("text", " "))
    n_uniq = F.size(F.array_distinct(wl))
    stop = F.size(
        F.array_intersect(wl, F.array(*[F.lit(s) for s in _PROFILES["en"]]))
    )
    quality = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop.cast("double") / n_uniq * 5, F.lit(1.0)) * 0.2
        + n_uniq.cast("double") / n_tokens * 0.4,
        6,
    )
    return d.select(
        "doc_id",
        quality.alias("quality"),
        F.when(quality >= 0.5, "keep").otherwise("drop").alias("verdict"),
    )


@query(
    "q_text_token_freq",
    oracle="""
    WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS token
                 FROM documents),
         cnt AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token)
    SELECT token, cnt, rk FROM (
      SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rk
      FROM cnt)
    WHERE rk <= 20
    """,
    tags=("text",),
)
def q_text_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency, top-20: explode -> count -> top-k. The
    explode runs per-partition inside codegen; the aggregation shuffles one
    row per distinct token (vocabulary-bounded, not corpus-bounded); the
    top-k is ``orderBy().limit()`` so Catalyst plans TakeOrderedAndProject —
    a fixed-size per-partition heap plus a 20-row driver merge, where a
    global un-partitioned window would sort-exchange the whole vocabulary
    to one task (billions of rows at web scale). The rank column is then a
    window over just the 20 survivors. This is the vocabulary-building
    primitive of a tokenizer-training pipeline."""

    d = load(spark, sf_dir, "documents")
    top = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return top.withColumn("rk", F.row_number().over(w).cast("bigint")).select(
        "token", "cnt", "rk"
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           sha256(lower(trim(text))) AS fingerprint,
           substr(sha256(lower(trim(text))), 1, 16) AS fp16
    FROM documents
    """,
    tags=("text",),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (lower+trim then sha256) plus a 16-hex
    shard-key prefix — the join/partition key for cross-corpus dedup at
    100 TB (fingerprint equality is exact-dup; fp16 is the bucketing key)."""
    d = load(spark, sf_dir, "documents")
    fp = F.sha2(F.lower(F.trim("text")), 256)
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 16).alias("fp16"),
    )


# GPT-2-style pre-tokenizer shape: contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs. No lookahead (Java regex and
# DuckDB's RE2 both run it with identical leftmost-first semantics — the
# real GPT-2 pattern's (?!\S) is unsupported by RE2, so it is omitted; the
# only divergence is trailing-space tokenization, irrelevant to counts on
# normal text).
BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


@query(
    "q_text_tokens_bpe",
    oracle=f"""
    SELECT doc_id,
           len(string_split(lower(text), ' ')) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '{BPE_PAT.replace("'", "''")}'))
             AS n_bpe_pieces,
           ROUND(CAST(length(text) AS DOUBLE)
                 / len(regexp_extract_all(lower(text),
                       '{BPE_PAT.replace("'", "''")}')), 6) AS chars_per_piece
    FROM documents
    """,
    tags=("text",),
)
def q_text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish pieces via a
    GPT-2-style pre-tokenizer regex — the cheap token-budget estimator a
    training pipeline runs over every document (chars_per_piece ~ the
    compression ratio a real BPE achieves; the regex is the pre-tokenizer
    half of BPE, counting merge units without a vocab). One regex pass per
    row inside codegen, map-only, no shuffle at any scale."""
    d = load(spark, sf_dir, "documents")
    n_bpe = F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_PAT), 0))
    return d.select(
        "doc_id",
        F.size(F.split(F.lower("text"), " ")).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_pieces"),
        F.round(F.length("text").cast("double") / n_bpe, 6).alias(
            "chars_per_piece"
        ),
    )


PACK_LEN = 2048  # tokens per packed training sequence


@query(
    "q_doc_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tok,
             -- DuckDB's windowed SUM(BIGINT) returns HUGEINT (int128); the
             -- driver hashes that differently from Spark's BIGINT even when
             -- every value is identical, so pin the oracle to BIGINT.
             CAST(SUM(len(string_split(text, ' '))) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM documents)
    SELECT doc_id, source, n_tok,
           (cum - n_tok) // {PACK_LEN} AS first_chunk,
           (cum - 1) // {PACK_LEN} AS last_chunk,
           (cum - 1) // {PACK_LEN} - (cum - n_tok) // {PACK_LEN} + 1
             AS n_chunks
    FROM t
    """,
    tags=("text", "window"),
)
def q_doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing — the pretraining batcher layout:
    documents are concatenated in (source, doc_id) order and the token
    stream is cut into fixed {PACK_LEN}-token training sequences; each doc
    reports the chunk span it lands in (first/last chunk, chunks crossed).
    Packing is PER SOURCE (the shard key), so the window is partitioned —
    at 100 TB each shard's running sum is an independent partition of the
    window exchange, never a global single-task sort; the chunk ids are
    pure integer arithmetic on the cumulative count, exact in both
    engines."""

    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = d.select(
        "doc_id", "source", n_tok.cast("bigint").alias("n_tok")
    ).withColumn("cum", F.sum("n_tok").over(w))
    # integer `div`, matching the oracle's BIGINT // — a floor(double /)
    # path would mis-truncate once cumulative counts exceed 2^53 (the
    # div-exactness class fixed in q_doc_pack_chunks, applied here too)
    first = F.expr(f"(cum - n_tok) div {PACK_LEN}")
    last = F.expr(f"(cum - 1) div {PACK_LEN}")
    return t.select(
        "doc_id",
        "source",
        "n_tok",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    )


@query(
    "q_doc_pack_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(SUM(len(string_split(text, ' '))) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM documents),
    dc AS (
      SELECT doc_id, source, n_tok, cum,
             unnest(range((cum - n_tok) // {PACK_LEN},
                          (cum - 1) // {PACK_LEN} + 1)) AS chunk
      FROM t)
    SELECT source, chunk,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc,
           CAST(SUM(least(cum, (chunk + 1) * {PACK_LEN})
                    - greatest(cum - n_tok, chunk * {PACK_LEN}))
                AS BIGINT) AS fill
    FROM dc GROUP BY source, chunk
    """,
    tags=("text", "window"),
)
def q_doc_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packed-sequence MANIFEST — q_doc_pack inverted to the batcher's
    actual output unit: one row per (source shard, {PACK_LEN}-token
    training sequence) with the documents it spans and its token fill
    (== {PACK_LEN} everywhere except each shard's final chunk). This is
    the table a data loader reads to fetch a batch: which docs to pull
    and which token spans of each.

    Plan: the per-shard running sum (partitioned window, never a global
    sort) feeds a sequence-explode of each doc's chunk span — the
    row-expansion is bounded by ceil(tokens/{PACK_LEN}) + docs, i.e.
    ~corpus/{PACK_LEN} output rows — then one hash aggregation on
    (source, chunk). All integer arithmetic, exact in both engines."""

    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = d.select(
        "doc_id", "source", n_tok.cast("bigint").alias("n_tok")
    ).withColumn("cum", F.sum("n_tok").over(w))
    # integer `div`, not floor(double /): cum is a bigint running sum, and
    # the double path loses exactness past 2^53 cumulative tokens (a real
    # number at 100 TB). Operands are non-negative so div == floor-div,
    # matching the oracle's `//`.
    first = F.expr(f"(cum - n_tok) div {PACK_LEN}")
    last = F.expr(f"(cum - 1) div {PACK_LEN}")
    dc = t.select(
        "doc_id",
        "source",
        "n_tok",
        "cum",
        F.explode(F.sequence(first, last)).alias("chunk"),
    )
    fill = F.least(
        F.col("cum"), (F.col("chunk") + 1) * PACK_LEN
    ) - F.greatest(F.col("cum") - F.col("n_tok"), F.col("chunk") * PACK_LEN)
    return dc.groupBy("source", "chunk").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum(fill).alias("fill"),
    )


@query(
    "q_bpe_merge_count",
    oracle=f"""
    WITH p AS (
      SELECT regexp_extract_all(lower(text),
               '{BPE_PAT.replace("'", "''")}') AS w
      FROM documents),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(w)),
               i -> w[i] || '|' || w[i+1])) AS pair
      FROM p WHERE len(w) >= 2),
    cnt AS (SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY pair)
    SELECT pair, cnt, rk FROM (
      SELECT pair, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rk
      FROM cnt)
    WHERE rk <= 20
    """,
    tags=("text",),
)
def q_bpe_merge_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training merge round: segment with the GPT-2-style
    pre-tokenizer (q_text_tokens_bpe's regex), count every ADJACENT piece
    pair over the corpus, rank the top-20 merge candidates — the inner
    loop of tokenizer training, distributed. The pair enumeration is a
    JVM HOF over each doc's piece array (no self-join: adjacency is
    positional), the aggregation shuffles one row per distinct pair
    (vocab^2-bounded, corpus-size-independent), and the top-k is
    TakeOrderedAndProject. Real BPE iterates this job, re-segmenting with
    the winning merge between rounds — the per-round plan is exactly this.

    The piece array is materialized as a column BEFORE the pair HOF:
    Catalyst does not common-subexpression-eliminate into lambda scopes,
    so referencing the regexp_extract_all expression inside the lambda
    re-runs the regex PER ELEMENT (measured 6.8s vs 0.7s at sf0.1)."""
    d = load(spark, sf_dir, "documents").withColumn(
        "w", F.regexp_extract_all(F.lower("text"), F.lit(BPE_PAT), 0)
    )
    w = F.col("w")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.concat_ws(
            "|", F.element_at(w, i), F.element_at(w, i + 1)
        ),
    )
    cnt = (
        d.filter(F.size(w) >= 2)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )

    wk = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return cnt.withColumn("rk", F.row_number().over(wk).cast("bigint")).select(
        "pair", "cnt", "rk"
    )


# deterministic source-mixing weights: keep-rate percent per source bucket.
# (A training-mix config; unlisted sources fall back to 100.)
MIX_RATES = {"src0": 100, "src1": 75, "src2": 50, "src3": 25, "src4": 10}
_LEHMER_M = 2147483647  # 2^31 - 1; doc_id * 48271 stays far below 2^63


def _sql_mix_rate() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {r}" for s, r in sorted(MIX_RATES.items())
    )
    return f"CASE source {cases} ELSE 100 END"


@query(
    "q_mix_sources",
    oracle=f"""
    WITH k AS (
      SELECT doc_id, source,
             (doc_id * 48271) % {_LEHMER_M} % 100 AS h
      FROM documents)
    SELECT doc_id, source, h
    FROM k WHERE h < {_sql_mix_rate()}
    """,
    tags=("text", "sampling"),
)
def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted source mixing — the data-mixing step that
    up/down-weights corpus shards to a target training distribution.
    Keep-decision is a pure-arithmetic Lehmer hash of doc_id (exactly
    reproducible in any engine, unlike xxhash/crc UDF seeds), compared to
    the per-source keep-rate. Map-only: at 100 TB this is one scan with
    the filter pushed to it; re-running with a new mix config re-samples
    deterministically without data movement. The hash value is emitted so
    the oracle checks the sampler itself, not just survivorship."""
    d = load(spark, sf_dir, "documents")
    h = (F.col("doc_id") * 48271) % _LEHMER_M % 100
    rate = F.lit(100)
    for s, r in sorted(MIX_RATES.items()):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    return (
        d.select("doc_id", "source", h.cast("bigint").alias("h"))
        .filter(F.col("h") < rate)
    )


@query(
    "q_text_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
    g AS (
      SELECT doc_id, w,
             CASE WHEN len(w) >= 3
                  THEN list_transform(range(1, len(w) - 1),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                  ELSE [] END AS g3
      FROM t)
    SELECT doc_id,
           ROUND(CASE WHEN len(g3) = 0 THEN 0.0
                 ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
                 END, 6) AS dup_3gram_ratio,
           ROUND(CAST(list_max(list_transform(list_distinct(w),
                   t -> len(list_filter(w, x -> x = t)))) AS DOUBLE)
                 / len(w), 6) AS top_token_ratio
    FROM g
    """,
    tags=("text",),
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter (the Gopher/C4-style signals):
    duplicate-3-gram ratio (how much of the doc is repeated phrasing) and
    top-token concentration (most frequent token / all tokens). The
    dup-3gram ratio is a per-row JVM HOF expression (map-only); the
    top-token count deliberately is NOT — the per-row nested-HOF form is
    O(distinct x n) per doc with the array re-materialized per element
    (measured 18s at sf0.1), so it runs as explode -> count per
    (doc, token) -> max per doc: one token-bounded shuffle plus a doc_id
    join back (see the inline comment). These two ratios are the
    standard cheap gates before expensive dedup.

    fanout (r18): the event-log profile showed every stage of this query
    running on ONE task — the single-row-group documents scan gives the
    3-gram HOF chain and the token-explode map side one partition each
    (379 + 370 ms single-task CPU at sf0.1). Same discipline as the
    dedup family: rebalance the dimension-sized scan before
    expression-heavy per-row work. The two consumers (dup ratio,
    top-token explode) each carry their own tiny round-robin exchange —
    their pushed scan filters differ, so the exchange is not reused —
    and the quiet-gated A/B still reads 0.94 -> 0.73s (0.77x)."""
    d = fanout(load(spark, sf_dir, "documents")).withColumn(
        "w", F.split(F.lower("text"), " ")
    )
    w = F.col("w")
    g3 = F.when(
        F.size(w) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(w, i),
                F.element_at(w, i + 1),
                F.element_at(w, i + 2),
            ),
        ),
    ).otherwise(F.array())
    # dup-3gram ratio is map-only on the materialized token array. The
    # top-token count is NOT computed as a nested per-distinct-token
    # filter HOF — that is O(distinct x n) per doc with the array
    # re-materialized per element (measured 18s at sf0.1); the scalable
    # shape is explode -> count per (doc, token) -> max per doc, a
    # token-bounded shuffle, then one doc_id join back.
    base = d.select("doc_id", F.size(w).alias("n_tok"), g3.alias("g3"))
    dup = base.select(
        "doc_id",
        "n_tok",
        F.round(
            F.when(F.size("g3") == 0, F.lit(0.0)).otherwise(
                1.0
                - F.size(F.array_distinct("g3")).cast("double")
                / F.size("g3")
            ),
            6,
        ).alias("dup_3gram_ratio"),
    )
    top = (
        d.select("doc_id", F.explode(w).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"))
    )
    return dup.join(top, "doc_id").select(
        "doc_id",
        "dup_3gram_ratio",
        F.round(F.col("top_cnt").cast("double") / F.col("n_tok"), 6).alias(
            "top_token_ratio"
        ),
    )


@query(
    "q_text_rarity",
    oracle="""
    WITH dt AS (SELECT DISTINCT doc_id,
                       unnest(string_split(lower(text), ' ')) AS token
                FROM documents),
         df AS (SELECT token, COUNT(*) AS df FROM dt GROUP BY token),
         n  AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT dt.doc_id, COUNT(*) AS n_uniq,
           CAST(SUM((n.n_docs * 1000000) // df.df) AS BIGINT) // COUNT(*)
             AS rarity
    FROM dt JOIN df USING (token) CROSS JOIN n
    GROUP BY dt.doc_id
    """,
    tags=("text",),
)
def q_text_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-IDF rarity scoring: per-document mean inverse document
    frequency over its distinct tokens — the quality signal a curation
    pipeline uses to separate boilerplate (every token everywhere, rarity
    → 1e6/N·df ≈ low) from information-dense text. The IDF is the
    integer-scaled variant (ppm-scaled N/df, floor division) instead of
    ln(N/df): transcendental libm results differ in the last ulp between
    the JVM and C runtimes, while integer // is exact in both engines —
    the repo's determinism convention (catalog.dsum docstring) applied to
    scoring. Monotonicity, the only property ranking cares about, is
    preserved.

    Plan: two shuffles — (doc, token) distinct + token df aggregation —
    then the df table joins back to the per-doc token stream. At 100 TB
    the vocabulary is Zipf-skewed but SMALL relative to the corpus (df is
    one row per distinct token), so the join back is a broadcast of the
    heavy-hitter head in practice; here AQE's runtime stats make that
    call. n_docs rides along as a broadcast scalar, never a barrier.
    """
    d = load(spark, sf_dir, "documents")
    n = d.agg(F.count("*").alias("n_docs"))
    dt = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias(
            "token"
        ),
    )
    dfreq = dt.groupBy("token").agg(F.count("*").alias("df"))
    return (
        dt.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_uniq"),
            F.expr(
                "sum((n_docs * 1000000) div df) div count(*)"
            ).alias("rarity"),
        )
    )


# ---------------------------------------------------------------------------
# inverted index (token -> bounded posting list + document frequency)
# ---------------------------------------------------------------------------

IDX_POSTINGS_CAP = 64  # per-token posting slice surfaced by the query
IDX_MIN_DF = 2  # singleton tokens are vocabulary noise, not index entries


@query(
    "q_inverted_index",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      unnest(list_distinct(string_split(lower(text), ' ')))
                        AS token
               FROM documents),
    f AS (SELECT token, doc_id FROM t
          WHERE regexp_matches(token, '\\A[a-z]+\\z')),
    r AS (SELECT token, doc_id,
                 COUNT(*) OVER (PARTITION BY token) AS dfc,
                 ROW_NUMBER() OVER (PARTITION BY token
                                    ORDER BY doc_id) AS rk
          FROM f)
    SELECT token, CAST(MAX(dfc) AS BIGINT) AS df,
           array_to_string(list(doc_id ORDER BY doc_id), ' ') AS postings
    FROM r WHERE rk <= {IDX_POSTINGS_CAP}
    GROUP BY token HAVING MAX(dfc) >= {IDX_MIN_DF}
    """,
    tags=("text",),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token → exact document frequency + the first
    IDX_POSTINGS_CAP doc ids ascending — the retrieval/search-side
    artifact a curation pipeline derives from the same corpus it trains
    on (BM25 stats, decontamination lookups, duplicate probes).

    Per-document token dedup is MAP-SIDE (array_distinct inside the
    projection, before explode), so the exchange carries one row per
    (token, document), never per occurrence. One shuffle on token drives
    everything: the window computes the exact df and ranks postings, and
    the groupBy reuses the same partitioning, so no second exchange
    (window + agg share the token clustering). The posting list is
    CAPPED before collection — WindowGroupLimit prunes each token's
    stream to the first 64 doc ids ahead of the sort — because at 100 TB
    a stop-word's full posting list is itself TB-scale: a real index
    shards postings into fixed-size blocks exactly like this (df stays
    exact over ALL postings; only the surfaced slice is bounded, so no
    collect_list ever holds an unbounded array).

    The posting slice is surfaced as a space-joined STRING, not an
    array column: the driver's canonicalizer hashes output values with
    pandas, where array cells are unhashable (the r05 red). The
    contract is enforced twice in CI — tests/test_oracle_types.py binds
    every registered oracle and rejects LIST/MAP/STRUCT output columns,
    and tests/parity.py raises on container cells from the Spark side —
    so local green implies driver green for all future queries.

    r18 negative result (recorded so it is not retried): fanout before
    the tokenize — the q_text_repetition fix — measured ~2x WORSE on
    exec here (0.60 -> 1.14s min across 4 quiet-gated rounds) despite
    the map side running one task today. Cause: WindowGroupLimit's
    map-side prune keeps the first IDX_POSTINGS_CAP doc ids per token
    PER PARTITION, so 32 input partitions push up to 32x more posting
    rows through the token exchange and its sort; with one input
    partition the partial prune is already exact. The scan task is not
    the bottleneck — the window is.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias(
            "token"
        ),
        # \A..\z, not ^..$: Java's $ also matches before a trailing
        # newline, RE2's does not — \A/\z mean end-of-text in BOTH
        # dialects, keeping the intersection discipline airtight for
        # texts that may contain newlines (review r05 finding)
    ).filter(F.col("token").rlike("\\A[a-z]+\\z"))
    w = Window.partitionBy("token")
    ranked = toks.select(
        "token",
        "doc_id",
        F.count("*").over(w).alias("dfc"),
        F.row_number().over(w.orderBy("doc_id")).alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= IDX_POSTINGS_CAP)
        .groupBy("token")
        .agg(
            F.max("dfc").alias("df"),
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), " "
            ).alias("postings"),
        )
        .filter(F.col("df") >= IDX_MIN_DF)
    )


# ---------------------------------------------------------------------------
# PII redaction (regex scrub — the curation pass every released corpus runs)
# ---------------------------------------------------------------------------

# Patterns restricted to syntax Java regex and RE2 execute identically
# (character classes, bounded repetition, \b word boundaries — the same
# dialect-intersection discipline as the BPE pre-tokenizer, textstats
# q_text_tokens_bpe).
_PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PII_PHONE = "\\b555-[0-9]{4}\\b"
_PII_IP = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


@query(
    "q_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-01'
                  || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.1' AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IP}', '<IP>', 'g') AS redacted
    FROM aug
    """,
    tags=("text",),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: count and mask emails, phone numbers, and IPv4
    addresses — the scrub every released training corpus runs before
    packing. The synthetic corpus carries no organic PII, so the query
    first APPENDS deterministic doc_id-derived PII to each document
    (identically in both engines) and then redacts it; a miscounted or
    misplaced replacement hash-mismatches, so the oracle checks the real
    redaction machinery, not a no-op.

    MAP-ONLY: three regexp_replace passes and three match counts per
    row, all whole-stage codegen — zero shuffles, the ideal 100 TB shape
    (pure scan→project→write; throughput scales with executors, no
    exchange anywhere). Patterns stay inside the Java-regex ∩ RE2
    dialect intersection (classes, bounded reps, word boundaries) with
    leftmost-first semantics identical across engines — the
    q_text_tokens_bpe discipline; replacement order (emails first)
    removes the digit-bearing local parts before the looser IP/phone
    patterns scan.

    Semantic caveat (both engines compute identically, so parity holds):
    the n_emails/n_phones/n_ips counts are RAW-TEXT occurrences, counted
    before any replacement, while redaction is sequential — a phone- or
    IP-shaped substring inside an email match is counted in its own
    column yet disappears under <EMAIL>, so counts may exceed what is
    visible in ``redacted``. A redaction REPORT wants raw occurrences
    (what was found); recount on ``redacted`` if you need what remains.

    r18 negative result (recorded so it is not retried): fanout before
    the regex passes. The event-log profile showed the six regexes
    running on the single-row-group scan's ONE task (450 ms single-task
    CPU) and the rebalance measured 0.54 -> 0.39s exec in a quiet-gated
    A/B — but it was REVERTED on review: this operator's contract is
    the zero-exchange scrub (test_plans pins "Exchange" not in plan —
    at 100 TB a round-robin of the full corpus TEXT to work around a
    fixture-scale single-row-group scan is exactly the shuffle the
    map-only shape exists to avoid; a real corpus scan has thousands of
    row groups and is already wide). The dedup-family fanouts differ:
    their downstream is shuffle-bound anyway, so the tiny rebalance
    adds no new data movement class.
    """
    d = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )
    t = d.select("doc_id", aug.alias("t"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("t", F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_PHONE),
            F.lit("<PHONE>"),
        ),
        F.lit(_PII_IP),
        F.lit("<IP>"),
    )
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_IP), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        red.alias("redacted"),
    )


# ---------------------------------------------------------------------------
# token co-occurrence lift (PMI without transcendentals)
# ---------------------------------------------------------------------------

PMI_VOCAB = 100  # co-occurrence vocabulary: top-N tokens by document freq
PMI_MIN_AB = 5  # minimum co-occurrence support


@query(
    "q_token_pmi",
    oracle=f"""
    WITH tok AS (SELECT doc_id,
                        unnest(list_distinct(string_split(lower(text), ' ')))
                          AS t
                 FROM documents),
    f AS (SELECT doc_id, t FROM tok WHERE regexp_matches(t, '\\A[a-z]+\\z')),
    cnt AS (SELECT t, COUNT(*) AS n FROM f GROUP BY t),
    voc AS (SELECT t, n FROM (
        SELECT t, n, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rk FROM cnt)
      WHERE rk <= {PMI_VOCAB}),
    fv AS (SELECT f.doc_id, f.t FROM f JOIN voc ON f.t = voc.t),
    pr AS (SELECT a.t AS token_a, b.t AS token_b, COUNT(*) AS n_ab
           FROM fv a JOIN fv b ON a.doc_id = b.doc_id AND a.t < b.t
           GROUP BY a.t, b.t),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT token_a, token_b, n_ab,
           (n_ab * n_docs * 1000000) // (va.n * vb.n) AS lift_ppm
    FROM pr CROSS JOIN nd
    JOIN voc va ON pr.token_a = va.t
    JOIN voc vb ON pr.token_b = vb.t
    WHERE n_ab >= {PMI_MIN_AB}
    """,
    tags=("text",),
)
def q_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence lift over a bounded vocabulary — the PMI-style
    association score corpus analysis uses for collocation mining and
    leakage probes, with the log dropped so the score stays in exact
    integer ppm: lift = P(a,b) / (P(a)·P(b)) = n_ab·n_docs / (n_a·n_b),
    scaled ×10⁶ and integer-divided (monotone in PMI, so ranking is
    preserved; transcendental-free, the q_text_rarity discipline).

    The quadratic term is CONTROLLED BY CONSTRUCTION: pairs are only
    generated within the top-PMI_VOCAB tokens (the standard co-occurrence
    shape), so per-document fanout is ≤ |vocab ∩ doc|² and the global
    pair space is ≤ vocab²/2 — independent of corpus size. Plan: one
    shuffle computes document frequencies, the vocabulary (a top-N over
    token counts) collapses to a single broadcast row, membership is a
    map-side array_intersect against the broadcast list, pairs explode
    JVM-side, and one final shuffle aggregates (a, b) counts; per-token
    totals re-attach via the same broadcast vocabulary, so the big side
    shuffles exactly twice (df count + pair count) at any scale. The
    tokenized corpus is localCheckpoint'ed (executor-local disk) because
    both the count and pair stages consume it; at 100 TB that cache is
    corpus-sized — the same spill-to-local-disk tradeoff as the dedup
    band frames, and recomputing the map-only tokenization instead is
    the one-line fallback if local disk is the scarcer resource.

    Stage-floor note (r06 negative result, recorded so it is not
    retried): collecting the vocabulary + doc count in one driver action
    and re-broadcasting them as a local relation / literal array
    measured SLOWER (0.99s -> ~1.3s at sf0.1) — the extra action's fixed
    cost exceeds the broadcast-subjob stages it removes, and the cnt
    exchange is already reused across the three vocab consumers. The
    remaining ~2x-vs-DuckDB gap is sequential stage latency on
    sub-second absolutes, not data volume.
    """
    d = load(spark, sf_dir, "documents")
    # r18 negative result (recorded so it is not retried): fanout before
    # the tokenize+checkpoint — the scan is one row group, so the
    # tokenize, cnt, and pair stages all run ONE task (~0.5s single-task
    # CPU in the event-log profile) — measured SLOWER end to end in a
    # 5-round quiet-gated A/B (1.25-1.31s -> 1.56-1.81s on the clean
    # draws): the per-task floor of 32-wide stages over ~30 docs each
    # (broadcast fetch, codegen init, checkpoint-block bookkeeping x3
    # consumers) exceeds the serial compute it parallelizes. Contrast
    # q_text_repetition, where the same fanout WINS (~0.75s of per-row
    # HOF CPU, only two consumers, no checkpoint multiplier).
    # eager checkpoint: the tokenized corpus is consumed twice (df counts,
    # pair generation) — without the cut both consumers re-run the
    # split+regex scan (measured 1.24s -> 0.94s at sf0.1). NEGATIVE result
    # kept for the record: generating i<j combinations map-side via nested
    # transform/slice/flatten HOFs instead of the double explode REGRESSES
    # (0.94s -> 1.74s, identical results) — the nested HOFs are interpreted
    # and allocate per-row pair-struct arrays, while two chained Generates
    # stream through whole-stage codegen; the 2x row overcount of the
    # explode+filter shape is cheaper than leaving codegen.
    toks = d.select(
        "doc_id",
        F.filter(
            F.array_distinct(F.split(F.lower("text"), " ")),
            # \A..\z: dialect-safe end-of-text anchors (see q_inverted_index)
            lambda t: t.rlike("\\A[a-z]+\\z"),
        ).alias("ts"),
    ).localCheckpoint(eager=True)
    cnt = toks.select(F.explode("ts").alias("t")).groupBy("t").agg(
        F.count("*").alias("n")
    )
    # top-N via orderBy().limit() -> TakeOrderedAndProject (per-partition
    # heap + driver merge of N rows), NOT a global row_number window that
    # would single-partition the whole vocabulary; the (n desc, t) order
    # is total, so this equals the oracle's ROW_NUMBER <= N exactly
    voc = cnt.orderBy(F.desc("n"), "t").limit(PMI_VOCAB).select("t", "n")
    # single broadcast row carrying the whole vocabulary (token, n) list
    vrow = voc.agg(F.collect_list(F.struct("t", "n")).alias("vl"))
    nd = d.agg(F.count("*").alias("n_docs"))
    pairs = (
        toks.crossJoin(F.broadcast(vrow))
        .select(
            # no array_sort: the a<b pair filter orders pairs by value,
            # so the intersect's element order is irrelevant
            F.array_intersect(
                "ts", F.expr("transform(vl, x -> x.t)")
            ).alias("vt")
        )
        .select(F.explode("vt").alias("token_a"), F.col("vt"))
        .select("token_a", F.explode("vt").alias("token_b"))
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= PMI_MIN_AB)
    )
    va = voc.select(F.col("t").alias("token_a"), F.col("n").alias("na"))
    vb = voc.select(F.col("t").alias("token_b"), F.col("n").alias("nb"))
    return (
        pairs.crossJoin(F.broadcast(nd))
        .join(F.broadcast(va), "token_a")
        .join(F.broadcast(vb), "token_b")
        .select(
            "token_a",
            "token_b",
            "n_ab",
            # overflow bound (the q_anomaly_zscore discipline): the BIGINT
            # numerator n_ab * n_docs * 10^6 overflows int64 once
            # n_ab * n_docs exceeds ~9.2e12 — e.g. a pair co-occurring in
            # 1M docs of a 10M-doc corpus. Under ANSI both engines fail
            # LOUDLY (no silent divergence); production headroom comes
            # from staged division, (n_ab * 1000000 div na) * n_docs
            # div nb, or a DECIMAL(38) cast — not needed at any tested SF.
            F.expr("(n_ab * n_docs * 1000000) div (na * nb)").alias(
                "lift_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# multi-round BPE trainer (iterative merges, exact oracle)
# ---------------------------------------------------------------------------

BPE_TRAIN_ROUNDS = 3


def _bpe_oracle_chain() -> str:
    """The WITH-chain both BPE oracles share: word counts, exploded symbol
    frame, and per-round (pair count, top-1, merge application, stats)
    CTEs — s{BPE_TRAIN_ROUNDS} is the fully-merged symbol corpus."""
    parts = [
        """
    WITH w AS (SELECT t AS word, CAST(COUNT(*) AS BIGINT) AS wcnt FROM (
          SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
        WHERE regexp_matches(t, '\\A[a-z]+\\z') GROUP BY t),
    s0 AS (SELECT word, wcnt,
                  unnest(range(1, len(cs) + 1)) AS pos, unnest(cs) AS tok
           FROM (SELECT word, wcnt, regexp_extract_all(word, '[a-z]') AS cs
                 FROM w))"""
    ]
    prev = "s0"
    for r in range(1, BPE_TRAIN_ROUNDS + 1):
        parts.append(f"""
    c{r} AS (SELECT a, b, CAST(SUM(wcnt) AS BIGINT) AS cnt FROM (
            SELECT wcnt, tok AS a,
                   lead(tok) OVER (PARTITION BY word ORDER BY pos) AS b
            FROM {prev})
          WHERE b IS NOT NULL AND a <> b GROUP BY a, b),
    t{r} AS (SELECT a, b, cnt FROM c{r} ORDER BY cnt DESC, a, b LIMIT 1),
    m{r} AS (SELECT word, wcnt, pos, tok, t{r}.a AS ma, t{r}.b AS mb,
                    t{r}.cnt AS mc,
                    COALESCE(tok = t{r}.a
                             AND lead(tok) OVER (PARTITION BY word
                                                 ORDER BY pos) = t{r}.b,
                             FALSE) AS m
             -- LEFT JOIN ON TRUE, not CROSS JOIN: when a round finds no
             -- candidate pair t{r} is EMPTY, and a cross join would
             -- vaporize the whole symbol corpus — s{r} must instead pass
             -- through unchanged (null ma/mb => m false), matching both
             -- implementations' break semantics (q_bpe_encode reads the
             -- final frame; the trainer tail reads only r{{...}} rows,
             -- which stay empty for dry rounds either way)
             FROM {prev} LEFT JOIN t{r} ON TRUE),
    mb{r} AS (SELECT *, COALESCE(lag(m) OVER (PARTITION BY word
                                              ORDER BY pos), FALSE) AS cons
              FROM m{r}),
    s{r} AS (SELECT word, wcnt, pos,
                    CASE WHEN m THEN tok || mb ELSE tok END AS tok
             FROM mb{r} WHERE NOT cons),
    r{r} AS (SELECT {r} AS round, a AS lhs, b AS rhs, cnt AS pair_cnt,
                    (SELECT CAST(SUM(wcnt) AS BIGINT) FROM s{r})
                      AS n_tokens_after
             FROM t{r})""")
        prev = f"s{r}"
    return ",".join(parts)


def _bpe_train_oracle() -> str:
    tail = " UNION ALL ".join(
        f"SELECT * FROM r{r}" for r in range(1, BPE_TRAIN_ROUNDS + 1)
    )
    return f"{_bpe_oracle_chain()}\n    {tail}"


def _bpe_encode_oracle() -> str:
    return f"""{_bpe_oracle_chain()},
    wl AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_tok
           FROM s{BPE_TRAIN_ROUNDS} GROUP BY word),
    dt AS (SELECT doc_id, t AS word FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
             FROM documents)
           WHERE regexp_matches(t, '\\A[a-z]+\\z'))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens_bpe
    FROM dt JOIN wl USING (word) GROUP BY doc_id
    """


def _bpe_pairs(frame: DataFrame) -> DataFrame:
    """Weighted pair counts INCLUDING degenerate groups (b null = word-final
    token, a = b = excluded-from-candidacy runs): every frame row lands in
    exactly one group, so the grand total over cnt equals the corpus token
    count — which lets round 1 recover the seed total from this same
    aggregation (exchange reuse) instead of a separate job."""
    wsp = Window.partitionBy("word").orderBy("pos")
    return (
        frame.select(
            "wcnt",
            F.col("tok").alias("a"),
            F.lead("tok").over(wsp).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.sum("wcnt").alias("cnt"))
    )


def _bpe_top1(pairs: DataFrame) -> DataFrame:
    """Winning candidate pair: top-1 via orderBy().limit(1), which compiles
    to TakeOrderedAndProject (heap, never a global sort — plan-frozen in
    tests/test_plans.py)."""
    return (
        pairs.filter(F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .orderBy(F.desc("cnt"), "a", "b")
        .limit(1)
    )


def _bpe_round_top(frame: DataFrame) -> DataFrame:
    return _bpe_top1(_bpe_pairs(frame))


def _bpe_apply_merge(frame: DataFrame, ma: str, mb: str) -> DataFrame:
    """Apply one merge (lhs=ma, rhs=mb) across the exploded corpus:
    mark matches via lead, drop consumed successors via lag of the mark,
    concat in place — all against literals (no join of any kind)."""
    wsp = Window.partitionBy("word").orderBy("pos")
    j = frame.withColumn(
        "m",
        F.coalesce(
            (F.col("tok") == F.lit(ma))
            & (F.lead("tok").over(wsp) == F.lit(mb)),
            F.lit(False),
        ),
    ).withColumn("cons", F.coalesce(F.lag("m").over(wsp), F.lit(False)))
    return j.filter(~F.col("cons")).select(
        "word",
        "wcnt",
        "pos",
        F.when(F.col("m"), F.lit(ma + mb)).otherwise(F.col("tok")).alias("tok"),
    )


# driver-side training cutoff: above this many distinct words the rounds
# run distributed (the _bpe_train_distributed path). 2M rows x ~30B is
# ~60MB of driver state — the same order as a collected k-means centroid
# set, and far below any real tokenizer vocabulary's corpus.
BPE_DRIVER_VOCAB_MAX = 2_000_000


def _bpe_train_local(vocab: list) -> list:
    """Merge rounds over the collected (word, wcnt) table — semantics
    identical to the distributed window algebra (pair candidacy lhs != rhs,
    greedy-left non-overlapping apply, cnt desc / lhs / rhs tie-break),
    property-tested equal against _bpe_train_distributed."""
    return _bpe_local(vocab)[0]


def _bpe_local(vocab: list) -> tuple[list, dict]:
    """Driver-side trainer core: returns (trajectory rows, final per-word
    symbol lists) so q_bpe_train takes the rows and q_bpe_encode the
    merged segmentation."""
    toks = {w: list(w) for w, _ in vocab}
    n_total = sum(wcnt * len(w) for w, wcnt in vocab)
    rows = []
    for r in range(1, BPE_TRAIN_ROUNDS + 1):
        counts: dict = {}
        for w, wcnt in vocab:
            s = toks[w]
            for i in range(len(s) - 1):
                if s[i] != s[i + 1]:
                    p = (s[i], s[i + 1])
                    counts[p] = counts.get(p, 0) + wcnt
        if not counts:
            break
        (ma, mb), mc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        n_total -= mc
        rows.append((r, ma, mb, mc, n_total))
        # apply EVERY round's merge (including the last): the trajectory
        # doesn't need the final application (closed-form n_total), but
        # q_bpe_encode consumes the fully-merged segmentation
        merged = ma + mb
        for w, _ in vocab:
            s = toks[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == ma and s[i + 1] == mb:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            toks[w] = out
    return rows, toks


def _bpe_tokens(d: DataFrame, *carry: str) -> DataFrame:
    """The ONE word-tokenization rule (explode on spaces, lowercase,
    alphabetic-only) with optional carried columns — shared by the
    vocabulary pass and q_bpe_encode's corpus side so the two can never
    silently drift apart (a divergent corpus-side rule would shrink the
    encode join instead of failing)."""
    return d.select(
        *carry, F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word").rlike("\\A[a-z]+\\z"))


def _bpe_words(d: DataFrame) -> DataFrame:
    """The distributed corpus pass: explode, keep alphabetic words, count
    — the word-frequency table BOTH trainer paths consume (and the only
    100 TB-scale stage of BPE training)."""
    return _bpe_tokens(d).groupBy("word").agg(F.count("*").alias("wcnt"))


def _bpe_frame(words: DataFrame) -> DataFrame:
    """Exploded (word, wcnt, pos, tok) symbol corpus, hash-partitioned by
    word ONCE and persisted: every per-round window clusters on word, so
    the cached distribution satisfies them all and no round re-exchanges
    the corpus. Shared by the distributed trainer and its plan-freeze
    test so the frozen plan can never drift from the real pipeline."""
    return (
        words.select(
            "word",
            "wcnt",
            F.posexplode(
                F.regexp_extract_all("word", F.lit("[a-z]"), F.lit(0))
            ).alias("pos0", "tok"),
        )
        .select("word", "wcnt", (F.col("pos0") + 1).alias("pos"), "tok")
        .repartition("word")
        .persist()
    )


def _bpe_train_distributed(words: DataFrame) -> list:
    """Merge rounds as distributed window algebra — the scale path for
    vocabularies past BPE_DRIVER_VOCAB_MAX.

    The merge application is CLOSED-FORM, no sequential scan: candidate
    pairs are restricted to lhs != rhs, and two adjacent matches would
    need s[i]=rhs=lhs — impossible — so matches never overlap and
    greedy-left BPE reduces to mark (tok=lhs AND next=rhs), drop consumed
    successors (lag of the mark), concat in place. One action per round:
    round 1's action yields BOTH the winning pair and the seed token
    total from one shared shuffle (_bpe_pairs partitions every token into
    exactly one (a,b) group, so sum(cnt) over the same aggregation is the
    corpus token count — ReusedExchange, pinned in tests/test_plans.py);
    the post-merge count is closed-form (every mark consumes exactly one
    successor, so n_after = n_before - pair_cnt); each merge application
    (against LITERALS, no join) rides lazily into the next round's
    action. The symbol corpus is hash-partitioned by word ONCE and
    persisted per round: every window clusters on word, so no round
    re-exchanges the corpus."""
    rows, _ = _bpe_distributed_core(words)
    return rows


def _bpe_distributed_core(words: DataFrame, finish=None) -> tuple:
    """The ONE distributed merge-round loop (mirrors _bpe_local's split):
    returns (trajectory rows, finish(final_frame)). Every round's merge
    is applied, including the last — the trainer passes no ``finish``
    (the final merge stays lazy and unmaterialized, so its persist marker
    costs nothing) while q_bpe_encode's ``finish`` reduces the merged
    frame to per-word token counts and MUST materialize its result
    (localCheckpoint/collect) because every cache this loop created is
    unpersisted before returning. Per-round cache discipline: prev is
    unpersisted only AFTER the next round's action has run against the
    new frame."""
    frame = _bpe_frame(words)
    n_total = 0
    rows = []
    prev = None
    for r in range(1, BPE_TRAIN_ROUNDS + 1):
        if r == 1:
            pairs = _bpe_pairs(frame)
            top1 = _bpe_top1(pairs).withColumn("kind", F.lit("top"))
            total = pairs.agg(F.sum("cnt").alias("cnt")).select(
                F.lit(None).cast("string").alias("a"),
                F.lit(None).cast("string").alias("b"),
                "cnt",
                F.lit("total").alias("kind"),
            )
            got = {
                row["kind"]: row for row in top1.unionByName(total).collect()
            }
            n_total = int(got["total"]["cnt"] or 0)
            top = [got["top"]] if "top" in got else []
        else:
            top = _bpe_round_top(frame).collect()
        if prev is not None:
            prev.unpersist()  # this round's action no longer reads it
            prev = None
        if not top:
            break  # dry candidates: frame is final
        ma, mb, mc = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        n_total -= mc
        rows.append((r, ma, mb, mc, n_total))
        prev, frame = frame, _bpe_apply_merge(frame, ma, mb).persist()
    result = finish(frame) if finish is not None else None
    if prev is not None:
        prev.unpersist()
    frame.unpersist()
    return rows, result


@query("q_bpe_train", oracle=_bpe_train_oracle(), tags=("text",))
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINER — BPE_TRAIN_ROUNDS=3 merge rounds, not just the single
    pair count of q_bpe_merge_count: each round picks the most frequent
    adjacent symbol pair (weighted by word frequency, deterministic
    (cnt desc, pair) tie-break), applies the merge across the whole
    symbol corpus, and re-counts on the merged symbols — the core loop
    of tokenizer training, as an ITERATIVE algorithm under the driver's
    single-SQL oracle (the q_cluster_kmeans / q_pagerank discipline:
    every round's choice and the post-merge token count hash-match, no
    "approximately trained" escape hatch).

    Plan (r06 reshape from the ~5-barriers-per-round shape the r05
    verdict measured at 6.2x): the 100 TB part of BPE training is the
    CORPUS PASS — explode, filter, count words — and that runs
    distributed, one scan + one vocabulary-bounded aggregation. The
    merge rounds then operate on the word-FREQUENCY table, whose size is
    the distinct vocabulary (bounded by language, not corpus: ~10M rows
    at any corpus scale), which is exactly why production tokenizer
    trainers (HuggingFace tokenizers, SentencePiece) collect it and
    train locally. This query does the same: one action collects the
    vocab table and the rounds run driver-side
    (_bpe_train_local). Past BPE_DRIVER_VOCAB_MAX distinct words it
    switches to _bpe_train_distributed — the same semantics as
    one-action-per-round window algebra (property-tested equal), so the
    escape hatch for pathological vocabularies is real, tested code,
    not a comment. Runs of a repeated symbol (the one case needing a
    sequential greedy pass) are excluded from pair CANDIDACY, a
    documented deviation some production tokenizers share.
    """
    words = _bpe_words(load(spark, sf_dir, "documents"))
    vocab = [
        (row["word"], int(row["wcnt"]))
        for row in words.limit(BPE_DRIVER_VOCAB_MAX + 1).collect()
    ]
    if len(vocab) <= BPE_DRIVER_VOCAB_MAX:
        rows = _bpe_train_local(vocab)
    else:
        rows = _bpe_train_distributed(words)
    # schema mirrors the pre-r06 aggregation output exactly (incl.
    # nullability) so driver schema/hash rows stay comparable across
    # rounds; pandas -> Arrow local relation for the same ~0.25s flat
    # py4j saving as q_bpe_encode's wmap (measured, row-count-independent)
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["round", "lhs", "rhs", "pair_cnt", "n_tokens_after"]
    ).astype(
        {
            "round": "int32",
            "lhs": "string",
            "rhs": "string",
            "pair_cnt": "int64",
            "n_tokens_after": "int64",
        }
    )
    return spark.createDataFrame(
        pdf,
        T.StructType(
            [
                T.StructField("round", T.IntegerType(), False),
                T.StructField("lhs", T.StringType(), True),
                T.StructField("rhs", T.StringType(), True),
                T.StructField("pair_cnt", T.LongType(), True),
                T.StructField("n_tokens_after", T.LongType(), True),
            ]
        ),
    )


@query("q_bpe_encode", oracle=_bpe_encode_oracle(), tags=("text",))
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the other half of q_bpe_train: encode every
    document with the 3 trained merges and report per-document token
    counts (n_words alphabetic words in, n_tokens_bpe BPE tokens out) —
    the sizing pass a training pipeline runs with its production
    tokenizer before packing sequences. The oracle re-derives the merges
    AND the merged segmentation relationally (the full trainer chain),
    so a wrong merge order, a mis-applied merge, or a wrong per-word
    length hash-mismatches.

    Plan: training reuses q_bpe_train's one-action corpus pass; encoding
    is then ONE broadcast join — BPE segmentation is a pure per-word
    function, so the corpus never tokenizes twice: the vocabulary-bounded
    (word -> token count) table broadcasts and the exploded corpus joins
    map-side, one aggregation by doc_id behind it. At 100 TB the corpus
    side is scan -> explode -> broadcast-join -> partial agg: no wide
    shuffle of anything corpus-sized except the final per-doc
    aggregation, and that is keyed by doc_id (pre-aggregated map-side).
    """
    docs = load(spark, sf_dir, "documents")
    words = _bpe_words(docs)
    vocab = [
        (row["word"], int(row["wcnt"]))
        for row in words.limit(BPE_DRIVER_VOCAB_MAX + 1).collect()
    ]
    if len(vocab) <= BPE_DRIVER_VOCAB_MAX:
        _, toks = _bpe_local(vocab)
        # pandas -> Arrow local relation: the tuple-list path serializes
        # through py4j row-by-row and costs ~0.33s FLAT (schema chatter,
        # not data — measured at 31 rows); the Arrow path is ~0.09s
        import pandas as pd

        wmap = spark.createDataFrame(
            pd.DataFrame(
                [(w, len(t)) for w, t in toks.items()],
                columns=["word", "n_tok"],
            ).astype({"word": "string", "n_tok": "int64"}),
            T.StructType(
                [
                    T.StructField("word", T.StringType(), True),
                    T.StructField("n_tok", T.LongType(), True),
                ]
            ),
        )
        # the table fits on the driver by the branch condition — broadcast
        join_side = F.broadcast(wmap)
    else:
        # distributed escape hatch: the shared merge-round core reduces
        # the final symbol frame to per-word token counts, materialized
        # (localCheckpoint) before the core releases its caches. NO
        # broadcast here: the hatch exists precisely because the table
        # exceeds the driver cap, so the join is left to the planner
        # (shuffled, or AQE-broadcast if stats say it fits after all).
        def _finish(frame: DataFrame) -> DataFrame:
            return (
                frame.groupBy("word")
                .agg(F.count("*").alias("n_tok"))
                .localCheckpoint(eager=True)
            )

        _, join_side = _bpe_distributed_core(words, finish=_finish)
    dt = _bpe_tokens(docs, "doc_id")
    return (
        dt.join(join_side, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_tokens_bpe"),
        )
    )


# ---------------------------------------------------------------------------
# corpus mixing (weighted multi-source sampling with epoch factors)
# ---------------------------------------------------------------------------

MIX_BUCKETS = 4096  # md5 sampling resolution: 3 hex chars


@query(
    "q_corpus_mix",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, lang, n_chars,
             CAST(substr(source, 4) AS INTEGER) AS sn,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3))::BIGINT
               AS bucket
      FROM documents)
    SELECT doc_id, source, lang, n_chars,
           CAST((sn % 4 + 1) AS DOUBLE) / 4.0 AS sample_rate,
           CAST(unnest(generate_series(1, sn % 3 + 1)) AS BIGINT) AS epoch
    FROM d
    WHERE bucket * 4 < (sn % 4 + 1) * {MIX_BUCKETS}
    """,
    tags=("text",),
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: per-source sampling rates plus
    per-source epoch (repeat) factors — the "data recipe" step that turns
    raw sources into a weighted training corpus (downsample the
    low-quality sources, run the high-quality ones for multiple epochs).
    Rates and epochs here derive from the source number (rate
    (sn%4+1)/4, epochs sn%3+1) so the oracle can replicate them; a real
    pipeline would broadcast-join a recipe table instead — same plan.

    The sampling predicate is a DETERMINISTIC md5 bucket of doc_id (the
    q_sample_stratified discipline: stable across runs, partitionings,
    and cluster sizes, unlike df.sample whose result depends on
    partition layout), at 1/4096 resolution so rates are exact dyadics.

    MAP-ONLY: scan -> filter -> project -> explode(sequence) — ZERO
    exchanges (plan-frozen in test_plans.py, the q_pii_redact class).
    At 100 TB the mixture is a pure scan-side pass: each executor keeps
    or repeats its own rows, nothing shuffles; epoch repetition is a
    generator, not a self-union, so the scan runs once per source row
    regardless of the epoch factor. sample_rate is k/4 (exact double).
    """
    d = load(spark, sf_dir, "documents")
    sn = F.substring("source", 4, 10).cast("int")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3), 16, 10).cast(
        "long"
    )
    rate_k = sn % 4 + 1
    return (
        d.select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            sn.alias("sn"),
            bucket.alias("bucket"),
        )
        .filter(F.col("bucket") * 4 < F.col("sn") % 4 * MIX_BUCKETS + MIX_BUCKETS)
        .select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            ((F.col("sn") % 4 + 1).cast("double") / 4.0).alias("sample_rate"),
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"), (F.col("sn") % 3 + 1).cast("long")
                )
            ).alias("epoch"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 term scoring (retrieval primitive: decontamination / dedup probes)
# ---------------------------------------------------------------------------

# fixed probe terms (a retrieval system's query side is always a curated,
# small set per request); mixed document frequencies on the fixture corpus
BM25_TERMS = ("join", "vector", "spark", "window", "slow")
# k1 = 6/5 and b = 3/4 as exact rationals (the standard 1.2 / 0.75)


@query(
    "q_text_bm25",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    dd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS s_tokens
      FROM dd),
    m AS (
      SELECT dd.doc_id, dd.dl, t.term,
             CAST(len(list_filter(toks, x -> x = t.term)) AS BIGINT) AS tf
      FROM dd, (VALUES {", ".join(f"('{t}')" for t in BM25_TERMS)})
                 AS t(term)),
    mm AS (SELECT * FROM m WHERE tf > 0),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM mm GROUP BY term)
    SELECT mm.term, mm.doc_id, mm.tf, mm.dl, dfreq.df,
           2*stats.n_docs - 2*dfreq.df + 1 AS idf_num,
           2*dfreq.df + 1 AS idf_den,
           44*stats.s_tokens*mm.tf AS tfn_num,
           20*stats.s_tokens*mm.tf + 6*stats.s_tokens
             + 18*mm.dl*stats.n_docs AS tfn_den,
           (CAST(2*stats.n_docs - 2*dfreq.df + 1 AS DOUBLE)
            / CAST(2*dfreq.df + 1 AS DOUBLE))
           * (CAST(44*stats.s_tokens*mm.tf AS DOUBLE)
              / CAST(20*stats.s_tokens*mm.tf + 6*stats.s_tokens
                     + 18*mm.dl*stats.n_docs AS DOUBLE)) AS score
    FROM mm, stats
    JOIN dfreq ON mm.term = dfreq.term
    """,
    tags=("text", "agg", "join"),
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 term-document scoring — the retrieval primitive a
    training-data pipeline runs to probe a corpus (eval-set
    decontamination beyond exact n-grams, targeted dedup, quality
    sampling by topicality): for each fixed probe term, every matching
    document's BM25 contribution with k1 = 1.2, b = 0.75.

    Exactness — the LOG-FREE EXACT-RATIONAL variant: ln() is not
    correctly rounded in either engine (the repo's no-transcendentals
    rule), so instead of ln-idf this emits the Robertson idf RATIO and
    the tf-normalization RATIO as exact BIGINT num/den pairs —
    idf = (2N − 2df + 1)/(2df + 1), and tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))
    with avgdl = S/N multiplied through by 20S into
    44·S·tf / (20·S·tf + 6·S + 18·dl·N) — all integer arithmetic, both
    engines bit-identical. The emitted score is the product of the two
    ratios via one fixed IEEE chain (two divides, one multiply of
    correctly-rounded casts). Per TERM the ranking is order-equivalent
    to standard BM25 (ln is monotone); contributions are emitted
    per-(term, doc) rather than pre-summed per query because dropping
    ln breaks additivity — a consumer sums ln(idf_num/idf_den)·tfn
    driver-side over its handful of query terms. Overflow bound:
    44·S·tf needs S·tf < 2.1e17, fine through ~1e15 corpus tokens at
    tf ≤ 100; past that the same exact integers feed the IEEE chain
    directly (still deterministic, no longer exact-rational).

    Plan: corpus rows NEVER shuffle. Tokenize once map-side; per-doc
    per-term tf is size(filter(tokens, = term)) stacked by
    inline(array(struct...)) — no corpus-token explode; ONE |terms|-row
    aggregation yields df AND the corpus stats (the stacked frame holds
    every doc exactly once per term, so each term group's count(*) = N
    and sum(dl) = S), re-entering as a single BROADCAST join (the
    q_histogram bounds-row pattern). Exchanges: one tiny term-keyed
    partial-agg collapse only; the tokenize pipeline plans twice (agg
    side + join side — the declarative price of no common-subtree
    reuse; at 100 TB you checkpoint the tokenized frame or pay two
    map-only columnar scans). The shape an inverted-index build would
    feed, not replace (q_inverted_index covers the index itself).
    """
    # ARRAY-FREE token math (the 10x-scaling fix: split + 5 per-term
    # array filters, planned twice, measured 3.96x at 10x data; pure
    # string arithmetic measured ~1.6x):
    #   dl  = spaces + 1           (split(' ') keeps empty tokens, so
    #                               token count is exactly spaces+1)
    #   tf  = occurrences of ' term ' in ' '||doubled||' ' where
    #         doubled = replace(text, ' ', '  ') — doubling gives every
    #         token its OWN flanking spaces, so matches never overlap
    #         and the length-delta count (len(s) − len(remove(s)))/len(p)
    #         is the exact token frequency
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit(" "),
            F.replace(F.col("text"), F.lit(" "), F.lit("  ")),
            F.lit(" "),
        ).alias("s"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("dl"),
    )
    # rebalance the single-row-group fixture scan before the per-term
    # string work (the q_dedup_ngram precedent — measured here 0.54 ->
    # 0.37s at sf0.1 and 2.4 -> 0.72s at 10x, ratio 3.9 -> ~1.9): at
    # 100 TB the corpus scan has thousands of tasks and a production
    # build gates this on observed scan parallelism instead
    d = fanout(d)

    def tf_of(term: str):
        pat = f" {term} "  # literal replace — terms are tokens, not regexes
        return (
            (
                F.length("s")
                - F.length(F.replace(F.col("s"), F.lit(pat), F.lit("")))
            )
            / len(pat)
        ).cast("long")

    per_term = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"), tf_of(t).alias("tf")
            )
            for t in BM25_TERMS
        ]
    )
    stacked = d.select("doc_id", "dl", F.inline(per_term))
    # ONE aggregation yields df AND the corpus stats: the stacked frame
    # carries every doc exactly once per term, so per term group
    # count(*) = N and sum(dl) = S — no separate corpus-stats pass, and
    # the tokenize pipeline is planned twice (agg + join side) instead
    # of three times (Catalyst has no common-subtree reuse)
    dfreq = stacked.groupBy("term").agg(
        F.count_if(F.col("tf") > 0).cast("long").alias("df"),
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").alias("s_tokens"),
    )
    mm = stacked.filter(F.col("tf") > 0)
    j = mm.join(F.broadcast(dfreq), "term")
    idf_num = 2 * F.col("n_docs") - 2 * F.col("df") + 1
    idf_den = 2 * F.col("df") + 1
    tfn_num = 44 * F.col("s_tokens") * F.col("tf")
    tfn_den = (
        20 * F.col("s_tokens") * F.col("tf")
        + 6 * F.col("s_tokens")
        + 18 * F.col("dl") * F.col("n_docs")
    )
    score = (idf_num.cast("double") / idf_den.cast("double")) * (
        tfn_num.cast("double") / tfn_den.cast("double")
    )
    return j.select(
        "term",
        "doc_id",
        "tf",
        "dl",
        "df",
        idf_num.alias("idf_num"),
        idf_den.alias("idf_den"),
        tfn_num.alias("tfn_num"),
        tfn_den.alias("tfn_den"),
        score.alias("score"),
    )
