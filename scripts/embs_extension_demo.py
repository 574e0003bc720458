"""q_dedup_embed_scaleb past the ladder ceiling: measure the documented
production action (extend EMBS_STEPS) instead of describing it.

The bits ladder caps at EMB_BITS + EMBS_STEPS = 13 bits (131072 rows keeps
band-bucket occupancy in [8, 16)); the docstring and test_dedup's extension
pins say "at true 100 TB you extend EMBS_STEPS — existing keys never
change". This script runs that action on a corpus that actually crosses
the ceiling (scale_synth --k 300: 600k vectors, stock occupancy 600k/2^13
~ 73 — 4.6x out of band) and reports:

  1. SAFETY  — at sf0.1 (2000 rows, below the old ceiling) the extended
     engine returns the bit-identical result set: bits_of(n) is unchanged
     below the old ceiling and the enlarged plane pool maps every existing
     (band, bit) to the same hyperplane (band-interleaved row layout +
     sequential RandomState fill). This is the runtime twin of
     test_dedup's analytic extension pin.
  2. COST    — wall at 300x, stock (bits=13, occupancy ~73) vs extended
     (EMBS_STEPS=12 -> bits=15, occupancy ~18, back inside one doubling of
     the [8, 16) design band).

Patching is runtime module-global assignment, the scale_synth EMB_BITS
precedent: the plan reads EMBS_STEPS and _EMB_PLANES at query-BUILD time,
so no engine change is needed to operate the knob.

Usage: python scripts/embs_extension_demo.py   (expects /tmp/sf_synth_300
from `scripts/scale_synth.py --k 300`; builds it if missing)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: osmpbf_spark
sys.path.insert(0, _HERE)  # scripts/: scale_synth, under any invocation style

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/sf_synth_300"
EXT = 2  # extra ladder steps, matching test_dedup's +2-step pin


def main() -> int:
    from osmpbf_spark.session import get_spark

    import scale_synth

    # a full build() dir (all tables) or an embeddings-only dir both work
    # — the demo reads only embeddings.parquet
    if not any(
        os.path.exists(f"{OUT}/{m}")
        for m in (scale_synth._MARKER, scale_synth._EMB_MARKER)
    ):
        scale_synth._configure(300)
        scale_synth.build_embeddings()

    spark = get_spark("embs_extension_demo")
    try:
        return _run(spark)
    finally:
        spark.stop()


def _run(spark) -> int:
    from osmpbf_spark.catalog import all_queries
    from osmpbf_spark.operators import dedup

    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()["q_dedup_embed_scaleb"]

    stock = (
        dedup.EMBS_STEPS,
        dedup.EMBS_MAXBITS,
        dedup._EMB_PLANES,
    )

    def patch_ext() -> None:
        dedup.EMBS_STEPS = stock[0] + EXT
        dedup.EMBS_MAXBITS = dedup.EMB_BITS + dedup.EMBS_STEPS
        # sequential fill: rows [0, stock pool) are bit-identical
        dedup._EMB_PLANES = np.random.RandomState(11).standard_normal(
            (dedup.EMB_BANDS * dedup.EMBS_MAXBITS, dedup.EMB_DIM)
        )

    def restore() -> None:
        dedup.EMBS_STEPS, dedup.EMBS_MAXBITS, dedup._EMB_PLANES = stock

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def t_of(sf_dir: str) -> float:
        mat(q(spark, sf_dir))  # warmup
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            mat(q(spark, sf_dir))
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 3)

    # ---- 1. SAFETY: extension is a no-op below the old ceiling ----
    rows_stock = sorted(
        (r.id1, r.id2, r.cos) for r in q(spark, SRC).collect()
    )
    patch_ext()
    rows_ext = sorted(
        (r.id1, r.id2, r.cos) for r in q(spark, SRC).collect()
    )
    restore()
    if rows_stock != rows_ext:
        print("FAIL: extension changed the sub-ceiling result set")
        return 1
    print(
        f"safety: sf0.1 result identical under +{EXT} steps "
        f"({len(rows_stock)} pairs)"
    )

    # ---- 2. COST at 300x: ceiling-bound vs extended ----
    n = (
        spark.read.parquet(f"{OUT}/embeddings.parquet").count()
    )
    bits_stock = dedup.EMB_BITS + sum(
        n >= (dedup.EMBS_BASE << j) for j in range(stock[0])
    )
    bits_ext = dedup.EMB_BITS + sum(
        n >= (dedup.EMBS_BASE << j) for j in range(stock[0] + EXT)
    )
    print(
        f"corpus n={n}: stock bits={bits_stock} "
        f"(occupancy ~{round(n / 2 ** bits_stock, 1)}), extended "
        f"bits={bits_ext} (occupancy ~{round(n / 2 ** bits_ext, 1)})"
    )
    a = t_of(OUT)
    print(f"300x stock (ceiling-bound): {a}s")
    patch_ext()
    try:
        b = t_of(OUT)
    finally:
        restore()
    print(f"300x extended (+{EXT} steps): {b}s  ({round(a / b, 2)}x faster)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
