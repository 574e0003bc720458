"""Batch twins for the streaming measurement class (r16 verdict Next #2).

The s_* queries' DuckDB oracles verify VALUES, not equivalent work: a
complete-mode stream re-executes micro-batch machinery (source offsets,
state store, sink) that a batch SELECT never pays, so a raw
spark_stream / duckdb_batch ratio measures the machinery, not the plan
(s_pbf_stream's oracle reads a pre-decoded parquet image in 4 ms while
Spark performs a real streaming PBF ingest). This module records the
FAIR ARM: for every registered s_* query, a Spark BATCH twin that does
the oracle's work as a batch plan, so the bench gate's "within 2x of
DuckDB" is decided on like work, and the streaming machinery cost is
reported SEPARATELY as spark_stream / spark_batch_twin.

Protocol (documented in BASELINE.md, scripted in
scripts/stream_fair_arm.py, runnable via gate_h2h --streams):

- class "batch": the registered query already IS a batch plan (the
  twin is the query itself); its gate ratio was never vacuous.
- class "stream": the twin runs the same transformation over the same
  batch frame (for the *_stream/*_append forms this is literally the
  body minus readStream/sink; for the LSH dedup streams it is the
  registry's batch form of the same operator family at the same
  parameters); ratio_like_work = spark(twin) / duckdb(twin oracle).
- class "noncomparable": DuckDB cannot perform the operational work at
  all (s_pbf_stream — no PBF decoder); the twin still quantifies the
  machinery overhead, and the DuckDB column is recorded as null rather
  than pretending a 4 ms image read is an arm.

Each twin returns the same logical result as the stream query's oracle
(same semantics, not necessarily the same column order — these are
TIMING arms; value correctness is already gated by the real oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmpbf_spark.catalog import REGISTRY, load
from osmpbf_spark.streaming import windows as W


def _events_max_us_ms_trunc(e: DataFrame) -> DataFrame:
    """End-of-stream watermark base: max event time, ms-truncated in
    micros (Spark tracks watermarks at ms precision)."""
    return e.agg(
        F.expr("max(unix_micros(ts)) div 1000 * 1000").alias("m")
    )


def _twin_tumble_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    agg = W.tumbling_agg(e)
    mx = _events_max_us_ms_trunc(e)
    return (
        agg.crossJoin(F.broadcast(mx))
        .filter(F.unix_micros("window_end") <= F.col("m") - W._US_30M)
        .drop("m")
    )


def _twin_session_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    agg = W.session_agg(e)
    mx = _events_max_us_ms_trunc(e)
    return (
        agg.crossJoin(F.broadcast(mx))
        .filter(F.unix_micros("session_end") <= F.col("m") - W._US_30M)
        .drop("m")
    )


def _twin_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select(F.sha2("text", 256).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id"))
    )


def _twin_dedup_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    w = Window.partitionBy(F.sha2("text", 256))
    return docs.select(
        "doc_id",
        F.min("doc_id").over(w).alias("keep_id"),
    ).withColumn(
        "is_dup", (F.col("doc_id") != F.col("keep_id")).cast("int")
    )


def _twin_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    return clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    ).select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")


def _twin_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


def _twin_anomaly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    x = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = e.select(
        "user_id",
        "event_id",
        "value",
        x.alias("x"),
        F.count("*").over(w).alias("n"),
        F.sum(x).over(w).alias("s"),
        F.sum(x * x).over(w).alias("q"),
    )
    dev = F.col("n") * F.col("x") - F.col("s")
    varn2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return c.filter((dev > 0) & (dev * dev > 9 * varn2)).select(
        "user_id",
        "event_id",
        "value",
        (dev.cast("double") / F.sqrt(varn2.cast("double"))).alias("z"),
    )


def _twin_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wu = Window.partitionBy("user_id")
    a = e.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
    )
    b = a.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(wu),
    )
    c = b.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(wu),
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.min("t1").alias("view_ts"),
            F.min("t2").alias("click_ts"),
            F.min("t3").alias("purchase_ts"),
        )
        .filter(F.col("view_ts").isNotNull())
        .withColumn(
            "depth",
            (
                F.lit(1)
                + F.col("click_ts").isNotNull().cast("long")
                + F.col("purchase_ts").isNotNull().cast("long")
            ).cast("long"),
        )
    )


def _twin_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return (
        e.select("event_id", "user_id", "value")
        .join(F.broadcast(cust), e["user_id"] == cust["c_custkey"])
        .select("event_id", "user_id", "value", "c_name", "c_mktsegment")
    )


def _twin_pbf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ingest of the SAME two-copy PBF source directory the stream
    reads — the engine's batch scan pipeline doing the identical decode
    work (DuckDB has no arm here: its oracle reads a pre-decoded parquet
    image)."""
    import atexit
    import shutil
    import tempfile

    from osmpbf_spark.sources import pbf_queries as PQ
    from osmpbf_spark.sources.pbf.datasource import read_pbf

    PQ.ensure_fixture()
    src = PQ._STREAM_SRC_DIR[0]
    if src is None:
        src = PQ._STREAM_SRC_DIR[0] = tempfile.mkdtemp(
            prefix="osmpbf_stream_"
        )
        atexit.register(shutil.rmtree, src, ignore_errors=True)
        for i in range(2):
            shutil.copy(
                f"{PQ._DIR}/fixture.osm.pbf", f"{src}/part-0000{i}.osm.pbf"
            )
    nodes = read_pbf(spark, src, "node")
    tile = (
        F.floor((F.col("lat") + 90) * 2048 / 180) * 2048
        + F.floor((F.col("lon") + 180) * 2048 / 360)
    ).cast("bigint")
    return nodes.groupBy(tile.alias("tile")).agg(F.count("*").alias("cnt"))


def batch_twins() -> dict[str, dict]:
    """{s_query: {fn, oracle, cls, note}} for every registered s_* query.

    ``fn`` is the batch twin callable (spark, sf_dir) -> DataFrame;
    ``oracle`` is the DuckDB SQL doing the twin's work (the stream
    query's own oracle when the twin mirrors it; the family query's own
    oracle when the twin IS a registered batch query; None when DuckDB
    has no equivalent arm); ``cls`` is batch | stream | noncomparable.
    """

    def own(name):
        return REGISTRY[name].oracle

    t: dict[str, dict] = {}
    # class batch: the registered query already is the batch plan
    for n in (
        "s_tumble",
        "s_slide",
        "s_session",
        "s_time_rollup",
        "s_late",
        "s_stateful",
    ):
        t[n] = {
            "fn": REGISTRY[n].fn,
            "oracle": own(n),
            "cls": "batch",
            "note": "registered query is already a batch plan",
        }
    # class stream: body-minus-machinery twins
    t["s_tumble_stream"] = {
        "fn": REGISTRY["s_tumble"].fn,
        "oracle": own("s_tumble_stream"),
        "cls": "stream",
        "note": "twin = s_tumble (same tumbling_agg over the batch frame)",
    }
    t["s_session_stream"] = {
        "fn": REGISTRY["s_session"].fn,
        "oracle": own("s_session_stream"),
        "cls": "stream",
        "note": "twin = s_session (same session_agg over the batch frame)",
    }
    t["s_tumble_append"] = {
        "fn": _twin_tumble_append,
        "oracle": own("s_tumble_append"),
        "cls": "stream",
        "note": "tumbling agg + end-of-stream watermark filter, batch",
    }
    t["s_session_append"] = {
        "fn": _twin_session_append,
        "oracle": own("s_session_append"),
        "cls": "stream",
        "note": "session agg + end-of-stream watermark filter, batch",
    }
    t["s_dedup_stream"] = {
        "fn": _twin_dedup_stream,
        "oracle": own("s_dedup_stream"),
        "cls": "stream",
        "note": "sha256 groupBy over the batch corpus",
    }
    t["s_dedup_append"] = {
        "fn": _twin_dedup_append,
        "oracle": own("s_dedup_append"),
        "cls": "stream",
        "note": "per-doc decision via min-over-fingerprint window, batch",
    }
    t["s_join_stream"] = {
        "fn": _twin_join_stream,
        "oracle": own("s_join_stream"),
        "cls": "stream",
        "note": "same interval join over the batch frame",
    }
    t["s_upsert_stream"] = {
        "fn": _twin_upsert_stream,
        "oracle": own("s_upsert_stream"),
        "cls": "stream",
        "note": "latest-wins rank window over the batch frame",
    }
    t["s_anomaly_stream"] = {
        "fn": _twin_anomaly_stream,
        "oracle": own("s_anomaly_stream"),
        "cls": "stream",
        "note": "running-prefix window form of the oracle, batch",
    }
    t["s_funnel_stream"] = {
        "fn": _twin_funnel_stream,
        "oracle": own("s_funnel_stream"),
        "cls": "stream",
        "note": "three-stage window-min funnel, batch",
    }
    t["s_enrich_stream"] = {
        "fn": _twin_enrich_stream,
        "oracle": own("s_enrich_stream"),
        "cls": "stream",
        "note": "same broadcast dim join over the batch frame",
    }
    t["s_dedup_near_stream"] = {
        "fn": REGISTRY["q_dedup_near"].fn,
        "oracle": REGISTRY["q_dedup_near"].oracle,
        "cls": "stream",
        "note": (
            "twin = q_dedup_near (batch MinHash LSH at production"
            " K/banding — the same operator family/parameters; both"
            " engine arms run the twin's own oracle semantics)"
        ),
    }
    t["s_dedup_embed_stream"] = {
        "fn": REGISTRY["q_dedup_embed"].fn,
        "oracle": REGISTRY["q_dedup_embed"].oracle,
        "cls": "stream",
        "note": (
            "twin = q_dedup_embed (batch hyperplane LSH, same planes;"
            " both engine arms run the twin's own oracle semantics)"
        ),
    }
    t["s_pbf_stream"] = {
        "fn": _twin_pbf_stream,
        "oracle": None,
        "cls": "noncomparable",
        "note": (
            "batch PBF scan of the same two-copy source; DuckDB has no"
            " PBF decoder — its oracle reads a pre-decoded parquet image"
            " (4 ms), which is not an arm"
        ),
    }
    return t
