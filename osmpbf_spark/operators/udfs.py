"""SURVEY.md §2C — the user-defined-function surface: scalar pandas UDF,
grouped-aggregate pandas UDF, and a Python UDTF.

Design rule (the 100 TB rule): every UDF is Arrow-batched — scalar and
grouped-agg via ``pandas_udf``, table function via the vectorized-enough
UDTF protocol — never row-at-a-time Python. Each query's Python logic has an
exact SQL twin, so the DuckDB oracle checks UDF *correctness*, not just
shape. (The grouped-map flavor of the surface is exercised by s_stateful in
streaming/windows.py; MinHash/SimHash signatures in dedup.py are further
production uses of the scalar form.)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType, IntegerType

from osmpbf_spark.catalog import load, query

# ---------------------------------------------------------------------------
# u_udf — scalar pandas UDF
# ---------------------------------------------------------------------------


@pandas_udf(IntegerType())
def token_count(texts: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over each Arrow batch. NULL in,
    NULL out — str.len() propagates NaN, matching the SQL twin's NULL
    semantics, where a map(len) would raise on the NaN instead."""
    return texts.str.split(" ").str.len().astype("Int32")


@query(
    "u_udf",
    oracle="""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents
    """,
    tags=("udf",),
)
def u_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF vs its SQL twin: the oracle proves the Python path
    computes exactly what the declarative path would. Map-only; Arrow
    transfer is the only overhead vs the built-in."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", token_count("text").alias("n_tokens"))


# ---------------------------------------------------------------------------
# u_udaf — grouped-aggregate pandas UDF
# ---------------------------------------------------------------------------


@pandas_udf(DoubleType())
def mean_log1p(v: pd.Series) -> float:
    """Aggregate mean(log1p(value)) — a UDAF shape SQL has no single
    built-in for; numpy within the group's Arrow batches."""
    import numpy as np

    return round(float(np.log1p(v.to_numpy(dtype="float64")).mean()), 6)


@query(
    "u_udaf",
    oracle="""
    SELECT event_type, ROUND(AVG(ln(1 + value)), 6) AS mlog
    FROM events GROUP BY event_type
    """,
    tags=("udf",),
)
def u_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (GROUPED_AGG): per-event-type mean(log1p).
    Shuffles once on the 5-key group column; the UDAF sees each group as
    numpy arrays. Rounded to 6 so double summation order across engines
    cannot flip the hash."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(mean_log1p("value").alias("mlog"))


# ---------------------------------------------------------------------------
# u_udtf — Python user-defined table function
# ---------------------------------------------------------------------------


@udtf(returnType="pos: int, token: string")
class SplitTokens:
    """UDTF: one input string -> one row per token with 1-based position
    (the UDTF analog of posexplode, reference Pig bag shape)."""

    def eval(self, text: str):
        if text is None:  # NULL text -> no rows, like posexplode(NULL)
            return
        for i, tok in enumerate(text.split(" ")):
            yield i + 1, tok


@query(
    "u_udtf",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) AS INTEGER) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 10
    """,
    tags=("udf",),
)
def u_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join: per-document tokenization emitting
    (pos, token) rows, hash-checked against unnest-with-ordinality.

    The doc_id predicate is applied in a subquery BELOW the lateral join:
    Catalyst does not push filters through a Python UDTF boundary, so the
    WHERE-after-join form tokenized the ENTIRE corpus and kept 10 rows
    (plan-verified: Filter above BatchEvalPythonUDTF; 0.73s -> 0.35s at
    sf0.1). At 100 TB this placement is the difference between a UDTF
    over the corpus and one over the selection — push predicates into
    the UDTF's input by hand, always."""
    spark.udtf.register("split_tokens", SplitTokens)
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM (SELECT doc_id, text FROM docs_udtf WHERE doc_id < 10) d,
             LATERAL split_tokens(d.text) t
        """
    )
