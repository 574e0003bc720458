"""Flagship: the reference README's own worked example, Spark-first.

The reference's primary documented use is a MapReduce job that bins node
coordinates into a 2048x2048 world grid and counts nodes per tile
(reference README.md:24-35: ``x=(lon+180)*2048/360``, ``y=(lat+90)*2048/180``,
key ``y*2048+x``, count per key). Here that whole map+shuffle+reduce program
is one declarative groupBy — Catalyst compiles it to partial (map-side)
aggregation + exchange + final aggregation, which is exactly the MR shape but
with whole-stage codegen and AQE-coalesced shuffle partitions.

The driver tables carry no lon/lat, so pseudo-coordinates are derived
deterministically from integer event columns (exact in both engines).
At 100 TB this plan is scan -> map-side partial agg -> shuffle of at most
2048*2048 distinct keys -> final agg: shuffle volume is bounded by grid
cardinality, not input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmpbf_spark.catalog import load, query

# Pseudo lon/lat from integer ids: exact doubles in both engines.
_LON = "(event_id % 3600) / 10.0 - 180.0"
_LAT = "(user_id % 1800) / 10.0 - 90.0"

GRID_ORACLE = f"""
SELECT
  CAST(FLOOR((({_LAT}) + 90.0) * 2048.0 / 180.0) AS BIGINT) * 2048
    + CAST(FLOOR((({_LON}) + 180.0) * 2048.0 / 360.0) AS BIGINT) AS tile,
  COUNT(*) AS n
FROM events
GROUP BY tile
"""


@query("q_grid_agg", oracle=GRID_ORACLE, tags=("flagship", "agg"))
def q_grid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bin + per-tile count (reference README.md:24-35)."""
    ev = load(spark, sf_dir, "events")
    lon = (F.col("event_id") % 3600) / 10.0 - 180.0
    lat = (F.col("user_id") % 1800) / 10.0 - 90.0
    x = F.floor((lon + 180.0) * 2048.0 / 360.0).cast("bigint")
    y = F.floor((lat + 90.0) * 2048.0 / 180.0).cast("bigint")
    return ev.groupBy((y * 2048 + x).alias("tile")).agg(F.count("*").alias("n"))
