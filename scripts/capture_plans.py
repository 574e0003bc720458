"""Capture .explain("formatted") for registered queries into plans/<tag>/.

Optimization-round evidence tool (guide §1/§7.2): the judge cannot run
Spark, so every plan claim in OPTIMIZATION_r*.md points at a file written
by this script. Usage:

    python scripts/capture_plans.py before            # all queries
    python scripts/capture_plans.py after q_dedup_embed q_grid_agg

Writes plans/<tag>/<query>_<suffix>.txt, where <tag> comes from the
SPARK_GRAFT_PLAN_TAG env var (default "r18" — the current round; r17
ADVICE: the literal "r17" silently mislabeled later rounds' captures).
Building a query executes any eager work it contains (localCheckpoint,
streaming sinks), so a full capture costs roughly one untimed bench pass.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmpbf_spark.catalog import all_queries  # noqa: E402
from osmpbf_spark.session import get_spark  # noqa: E402

PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_TAG", "r18"),
)


def explain_str(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(PLAN_DIR, exist_ok=True)

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [n for n in qs if not only or n in only]
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            txt = explain_str(spark, df)
        except Exception as exc:
            txt = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt + "\n")
        print(
            f"[{i + 1}/{len(names)}] {name}: {len(txt)}B"
            f" ({time.perf_counter() - t0:.2f}s)"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
