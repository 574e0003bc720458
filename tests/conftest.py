from __future__ import annotations

import duckdb
import pytest

from osmpbf_spark.catalog import TABLES
from osmpbf_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("osmpbf_spark_tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    # Cap + spill: the oracle queries need well under 8 GB, but DuckDB's
    # default limit is 80% of machine RAM — under EXTERNAL memory
    # pressure (co-tenant burst) a tiny query can then die with
    # OutOfMemory instead of spilling (observed: a 49-test OOM wave in
    # one full-suite run that never reproduced). A small limit + temp
    # dir makes the oracle side degrade to disk, not to a false red.
    con.execute("SET memory_limit='8GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill_tests'")
    # r09 full-suite flake: one late-suite oracle died with a 2 KB
    # 'bad allocation' INSIDE the 8 GB cap while the host had >100 GB
    # free — 32 default threads each hold buffer headroom against the
    # cap, so tiny queries can transiently exceed it late in an
    # 880-test session. The oracles are sub-second at 8 threads.
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
