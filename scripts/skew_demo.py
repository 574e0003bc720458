"""Hot-key join at 100x: naive vs AQE skew-split vs salted (r12 Next #5).

q_join_skew_salt proves the salted SHAPE at sf0.1; this script measures
the three physical strategies on a corpus where skew actually bites:
orders scaled 100x (15M rows) with ONE engineered hot key owning ~30%
of the fact side (the r12 verdict's spec), customer from sf0.1 verbatim.

Arms (identical logical query: orders JOIN customer ON custkey,
GROUP BY c_mktsegment — the aggregation key differs from the join key,
so AQE's skew split stays legal; see test_plans.py
test_aqe_skew_join_split_engages for the distribution-reuse caveat):

  naive    — sort-merge join, AQE skew split disabled: one reducer owns
             30% of the shuffle; the straggler IS the wall clock.
  aqe      — skew split enabled (factor 1.5 / threshold 2MB /
             advisory 4MB: the knobs are in bytes of COMPRESSED shuffle
             data and this 100-copy synthetic compresses hard — a 100 TB
             deployment tunes the same knobs in the same units):
             OptimizeSkewedJoin splits the hot partition across tasks at
             runtime.
  salted   — the q_join_skew_salt rewrite (probe salt = hash(row) % S,
             build side exploded S ways): the skew never reaches the
             shuffle in the first place.

Broadcast is deliberately disabled for the fact-dim join: at 100 TB the
dim side of a skewed join is not always broadcastable, and the point is
to measure the shuffle strategies. All three arms must return identical
results (asserted).

Usage: python scripts/skew_demo.py
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/sf_skew_100"
MARKER = "_built_v1"
K = 100
HOT_KEY = 1


def build() -> None:
    import duckdb

    if os.path.exists(f"{OUT}/{MARKER}"):
        return
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    # ~30% of rows re-keyed to the hot custkey; the rest keep their
    # original key (uniform tail). Copy-shifted orderkeys keep rows unique.
    con.execute(f"""
    COPY (SELECT o_orderkey + k*100000000 AS o_orderkey,
                 CASE WHEN (o_orderkey + k) % 10 < 3 THEN {HOT_KEY}
                      ELSE o_custkey END AS o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{SRC}/orders.parquet'),
               unnest(range(0,{K})) AS t(k))
    TO '{OUT}/orders.parquet' (FORMAT PARQUET)""")
    import shutil

    shutil.copy(f"{SRC}/customer.parquet", f"{OUT}/customer.parquet")
    with open(f"{OUT}/{MARKER}", "w") as fh:
        fh.write("ok")


def main() -> int:
    from pyspark.sql import functions as F

    from osmpbf_spark.session import get_spark

    t0 = time.perf_counter()
    build()
    print(f"corpus: {K}x orders, 30% on custkey={HOT_KEY} "
          f"(build/check {round(time.perf_counter() - t0, 1)}s)")

    spark = get_spark("skew_demo")
    try:
        spark.sparkContext.setLogLevel("ERROR")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        # skew thresholds are in bytes of COMPRESSED shuffle data: this
        # corpus is 100 key-shifted copies, so lz4 squeezes the hot
        # partition's 72 MB raw (4.5M rows x 16B) under 16 MB — scale the
        # knobs to the compressed sizes, exactly what a 100 TB deployment
        # does (same two knobs, same units)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            str(2 * 1024 * 1024),
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            str(4 * 1024 * 1024),
        )

        def plain():
            o = spark.read.parquet(f"{OUT}/orders.parquet")
            c = spark.read.parquet(f"{OUT}/customer.parquet").select(
                "c_custkey", "c_mktsegment"
            )
            return (
                o.join(c, o.o_custkey == c.c_custkey)
                .groupBy("c_mktsegment")
                .agg(
                    F.count("*").alias("cnt"),
                    F.sum(
                        F.round(F.col("o_totalprice") * 100).cast("long")
                    ).alias("cents"),
                )
            )

        def salted(S: int = 16):
            o = spark.read.parquet(f"{OUT}/orders.parquet").withColumn(
                "salt", F.pmod(F.hash("o_orderkey"), F.lit(S)).cast("int")
            )
            c = (
                spark.read.parquet(f"{OUT}/customer.parquet")
                .select("c_custkey", "c_mktsegment")
                .withColumn(
                    "salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1)))
                )
            )
            return (
                o.join(
                    c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt)
                )
                .groupBy("c_mktsegment")
                .agg(
                    F.count("*").alias("cnt"),
                    F.sum(
                        F.round(F.col("o_totalprice") * 100).cast("long")
                    ).alias("cents"),
                )
            )

        def timed(mk, skew_split: bool) -> tuple[float, list, str]:
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(skew_split).lower()
            )
            mk().write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            df = mk()
            rows = df.collect()
            dt = time.perf_counter() - t0
            plan = df._jdf.queryExecution().executedPlan().toString()
            tag = " [skew=true in plan]" if "skew=true" in plan else ""
            return dt, sorted(map(tuple, rows)), tag

        t_naive, r_naive, _ = timed(plain, skew_split=False)
        print(f"naive (no skew split): {round(t_naive, 2)}s")
        t_aqe, r_aqe, tag = timed(plain, skew_split=True)
        print(f"aqe skew split:        {round(t_aqe, 2)}s "
              f"({round(t_naive / t_aqe, 2)}x vs naive){tag}")
        t_salt, r_salt, _ = timed(salted, skew_split=False)
        print(f"salted (S=16):         {round(t_salt, 2)}s "
              f"({round(t_naive / t_salt, 2)}x vs naive)")
        assert r_naive == r_aqe == r_salt, "arms disagree on results"
        print("result parity across all three arms: OK "
              f"({len(r_naive)} groups)")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
