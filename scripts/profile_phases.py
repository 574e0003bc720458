"""Per-query BUILD/EXEC phase profiler (optimization rounds, guide §1).

Splits each registered query's wall into BUILD (the ``fn(spark, sf_dir)``
call — py4j plan construction, Catalyst analysis, and any eager work the
operator contains: streaming runs, localCheckpoints, store builds) and
EXEC (the noop write of the returned frame). Warm: one untimed pass, then
min-of-2 timed windows per phase pair.

Usage:
    python scripts/profile_phases.py                 # all queries
    python scripts/profile_phases.py q_corr s_tumble_stream

Writes a JSON report to /tmp/phase_profile.json and prints a sorted
table (worst BUILD first).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmpbf_spark.catalog import all_queries  # noqa: E402
from osmpbf_spark.session import get_spark  # noqa: E402


def main() -> int:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = os.environ.get(
        "SPARK_GRAFT_PHASE_OUT", "/tmp/phase_profile.json"
    )
    spark = get_spark("profile_phases")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [n for n in qs if not only or n in only]
    rows: dict[str, dict] = {}
    for i, name in enumerate(names):
        fn = qs[name]
        try:
            # warm pass (codegen, workers, footer caches)
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            build = exec_ = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                build = min(build, t1 - t0)
                exec_ = min(exec_, t2 - t1)
            rows[name] = {
                "build": round(build, 4),
                "exec": round(exec_, 4),
                "total": round(build + exec_, 4),
            }
            print(
                f"[{i + 1}/{len(names)}] {name}: build={build:.3f}"
                f" exec={exec_:.3f}"
            )
        except Exception as exc:
            rows[name] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"[{i + 1}/{len(names)}] {name}: FAILED {exc}")
    with open(out_path, "w") as fh:
        json.dump(rows, fh, indent=1)
    ok = {n: r for n, r in rows.items() if "build" in r}
    print("\n-- worst BUILD --")
    for n, r in sorted(ok.items(), key=lambda kv: -kv[1]["build"])[:25]:
        print(f"{n:32s} build={r['build']:.3f} exec={r['exec']:.3f}")
    print(
        f"\nTOTAL build={sum(r['build'] for r in ok.values()):.1f}s "
        f"exec={sum(r['exec'] for r in ok.values()):.1f}s "
        f"({len(ok)} queries)"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
