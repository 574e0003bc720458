"""Splittable OSM PBF data source for Spark (the reference's identity,
rebuilt on the PySpark Python Data Source API).

Public surface:
- ``OsmPbfDataSource`` / ``register(spark)`` — ``spark.read.format("osmpbf")``
- ``read_pbf(spark, path, primitive=...)`` — convenience reader
- ``decode`` / ``encode`` — the pure-Python scan pipeline + PBF sink
- ``fixture`` — deterministic golden-value fixture (FIXTURES.md)
"""

from osmpbf_spark.sources.pbf.datasource import (  # noqa: F401
    OsmPbfDataSource,
    read_pbf,
    register,
)
