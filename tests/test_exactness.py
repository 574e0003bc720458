"""Engine-level exactness pins for the integer-arithmetic recipes.

These run the PRODUCTION query/expression paths on adversarial synthetic
data and compare against exact rational arithmetic (fractions.Fraction),
so a regression back to float comparisons — the boundary-rounding bug
class ADVICE flagged twice — fails loudly rather than lurking until a
dataset hits a boundary.
"""

from __future__ import annotations

import math
import random
from fractions import Fraction

from pyspark.sql import functions as F


def test_anomaly_zscore_flags_match_exact_rational(spark, tmp_path):
    """q_anomaly_zscore end-to-end on adversarial groups: random groups,
    constant-value groups (zero variance — the NaN hazard), singletons,
    and tight-variance groups; the flag set must equal the exact
    Fraction-arithmetic definition z > 3, and each emitted z must equal
    the same cast/divide/sqrt chain computed in Python (both engines'
    ops are IEEE-exact / correctly rounded)."""
    from osmpbf_spark.catalog import REGISTRY, all_queries

    all_queries()
    rng = random.Random(42)
    rows = []
    eid = 0
    groups: dict[int, list[int]] = {}

    def add_group(uid: int, cents: list[int]):
        nonlocal eid
        groups[uid] = cents
        for c in cents:
            eid += 1
            rows.append((eid, uid, "e", c / 100.0))

    for uid in range(40):  # random skewed groups
        n = rng.randint(2, 60)
        add_group(uid, [rng.randint(1, 49_000) for _ in range(n)])
    add_group(100, [500] * 10)  # zero variance -> NaN hazard
    add_group(101, [12345])  # singleton -> zero variance
    add_group(102, [100, 100, 100, 101])  # tight variance, near-boundary
    add_group(103, [1, 1, 1, 1, 1, 2])

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("event_id") * 1000000))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = REGISTRY["q_anomaly_zscore"].fn(spark, str(tmp_path)).toPandas()

    expect: dict[int, float] = {}
    for uid, cents in groups.items():
        n, s = len(cents), sum(cents)
        q = sum(c * c for c in cents)
        for i, x in enumerate(cents):
            dev, varn2 = n * x - s, n * q - s * s
            if dev > 0 and varn2 > 0 and Fraction(dev * dev, varn2) > 9:
                key = (uid, x, i)
                expect[key] = float(dev) / math.sqrt(float(varn2))
    assert len(got) == len(expect), (
        f"flag count mismatch: spark={len(got)} exact={len(expect)}"
    )
    # per-user flagged multiset of (value, z) matches bit-for-bit
    got_set = sorted(zip(got.user_id, got.value.round(2), got.z))
    exp_set = sorted(
        (uid, x / 100.0, z) for (uid, x, _i), z in expect.items()
    )
    for (gu, gv, gz), (eu, ev, ez) in zip(got_set, exp_set):
        assert (gu, gv) == (eu, ev)
        assert gz == ez, f"z not bit-exact: {gz!r} != {ez!r}"


def test_chunk_div_exact_beyond_double_precision(spark):
    """The sequence-packing chunk arithmetic must stay exact past 2^53:
    the integer `div` path matches Python big-int division on cumulative
    counts a double cannot represent, while the rejected floor(double /)
    recipe provably drifts there — pinning WHY q_doc_pack uses div."""
    # chosen so double(cum - n_tok) rounds UP across a chunk boundary:
    # ulp at 2^60 is 256, and 2^60 + 1948 rounds to 2^60 + 2048 — one
    # whole chunk later than the exact quotient
    cum = (1 << 60) + 1949
    n_tok = 1
    df = spark.createDataFrame([(cum, n_tok)], "cum long, n_tok long")
    row = df.select(
        F.expr("(cum - n_tok) div 2048").alias("div_first"),
        F.expr("(cum - 1) div 2048").alias("div_last"),
        F.floor((F.col("cum") - F.col("n_tok")) / 2048).alias("flt_first"),
    ).first()
    assert row.div_first == (cum - n_tok) // 2048
    assert row.div_last == (cum - 1) // 2048
    # the double path loses the low bits at this magnitude — if this ever
    # starts passing, doubles got wider and the pin should be revisited
    assert row.flt_first != (cum - n_tok) // 2048


def test_load_schema_cache_identical_and_invalidates(spark, tmp_path):
    """r17 optimization: load() replays a cached inferred schema via
    spark.read.schema() to skip per-call driver-side footer inference.
    The warm read must be bit-identical to the cold read (schema AND
    rows), and rewriting the file must invalidate the cached entry."""
    import shutil

    from osmpbf_spark import catalog
    from osmpbf_spark.catalog import _SCHEMA_CACHE, load
    from tests.conftest import SF_DIR

    sf_dir = str(tmp_path)
    shutil.copy(f"{SF_DIR}/events.parquet", f"{sf_dir}/events.parquet")
    _SCHEMA_CACHE.clear()
    cold = load(spark, sf_dir, "events")
    assert len(_SCHEMA_CACHE) == 1
    cold_schema = cold.schema
    cold_rows = sorted(map(str, cold.collect()))
    warm = load(spark, sf_dir, "events")
    assert warm.schema == cold_schema
    assert sorted(map(str, warm.collect())) == cold_rows
    # rewrite -> new (size, mtime_ns) identity -> fresh inference
    key0 = next(iter(_SCHEMA_CACHE))
    shutil.copy(f"{SF_DIR}/orders.parquet", f"{sf_dir}/events.parquet")
    assert catalog._file_identity(f"{sf_dir}/events.parquet") != key0
    reread = load(spark, sf_dir, "events")
    assert "o_orderkey" in reread.columns
