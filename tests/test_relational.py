"""Oracle-parity tests for the SURVEY §2B relational surface."""

from __future__ import annotations

import pytest

from osmpbf_spark.catalog import REGISTRY, all_queries
from tests.conftest import SF_DIR
from tests.parity import check_query

all_queries()  # force registration

RELATIONAL = sorted(
    n
    for n, q in REGISTRY.items()
    if not set(q.tags) & {"stream", "dedup", "sim", "text", "multimodal", "udf", "pbf"}
)


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_parity(spark, duck, name):
    spark_pdf, _ = check_query(spark, duck, SF_DIR, name)
    assert len(spark_pdf) > 0, f"{name}: empty result"


def test_resample_locf_null_value_keeps_columns_synchronized(spark):
    """A NULL-valued event must advance NEITHER carried column: value_locf
    and src_event_id come from the same value-bearing event (review r05
    finding — independent ignorenulls windows let a null-value event
    update the id while the value still came from an older event)."""
    from datetime import datetime

    import osmpbf_spark.operators.cdc as cdc_mod

    sdf = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 5), 7, "view", 3.0, None),
            (2, datetime(2024, 1, 1, 10, 40), 7, "view", None, None),
            (3, datetime(2024, 1, 1, 11, 20), 7, "view", 5.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = cdc_mod.load
    try:
        cdc_mod.load = lambda spark, sf_dir, t: sdf
        pdf = cdc_mod.q_resample_locf(spark, "ignored").toPandas()
    finally:
        cdc_mod.load = orig
    import pandas as pd

    r = pdf[pdf.hour_ts == pd.Timestamp("2024-01-01 11:00:00")].iloc[0]
    assert r.value_locf == 3.0 and r.src_event_id == 1
    # the pre-first-event grid hour carries nothing at all
    r0 = pdf[pdf.hour_ts == pd.Timestamp("2024-01-01 10:00:00")].iloc[0]
    assert pd.isna(r0.value_locf) and pd.isna(r0.src_event_id)


def test_profile_all_null_column_counts_zero_distinct(spark):
    """An entirely-NULL profiled column must report n_distinct = 0 (like
    COUNT(DISTINCT)) instead of throwing on the missing map key under
    ANSI mode (review r05 finding)."""
    from datetime import datetime

    import pandas as pd

    import osmpbf_spark.operators.cdc as cdc_mod

    sdf = spark.createDataFrame(
        [
            (None, 1, "A", datetime(2024, 1, 1)),
            (None, 2, "B", datetime(2024, 1, 2)),
        ],
        "l_orderkey long, l_linenumber int, l_returnflag string, "
        "l_shipdate timestamp",
    )
    orig = cdc_mod.load
    try:
        cdc_mod.load = lambda spark, sf_dir, t: sdf
        pdf = cdc_mod.q_profile(spark, "ignored").toPandas()
    finally:
        cdc_mod.load = orig
    row = pdf[pdf.col_name == "l_orderkey"].iloc[0]
    assert row.n_nulls == 2 and row.n_distinct == 0
    assert pd.isna(row.min_str) and pd.isna(row.max_str)
