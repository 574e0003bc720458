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
