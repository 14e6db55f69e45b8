#!/usr/bin/env python
"""Round-13 optimization profiler: time individual registered queries
through the noop sink (guide §1.4) and dump .explain("formatted") to
plans/r12/<query>_<tag>.txt (guide §1 — measure first, keep plan
evidence).

Usage:
  python scripts/profile_r13.py [--sf DIR] [--runs N] [--tag before|after]
                                [--plans] query [query ...]

Prints one line per query: name, min, median, all runs. Job groups are
labeled so the (disabled-by-default) UI or event logs stay readable.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default=None, help="plan dump suffix")
    ap.add_argument("--plans", action="store_true", help="dump explain output")
    args = ap.parse_args()

    from genpipe_spark import registry
    from genpipe_spark.session import get_spark

    registry.load_all_query_modules()
    spark = get_spark("genpipe-profile-r13")
    spark.sparkContext.setLogLevel("ERROR")

    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r13"
    if args.plans:
        plans_dir.mkdir(parents=True, exist_ok=True)

    # warm the JVM + parquet footers (bench.py does the same)
    registry.QUERIES["join-inner-equi"](spark, args.sf).write.format(
        "noop"
    ).mode("overwrite").save()

    for name in args.queries:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED")
            continue
        if args.plans:
            df = fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            tag = args.tag or "before"
            (plans_dir / f"{name}_{tag}.txt").write_text(txt)
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            start = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.perf_counter() - start)
        spark.sparkContext.setJobDescription(None)
        s = sorted(runs)
        if s:
            print(
                f"{name:40s} min={s[0]:7.3f} med={s[len(s) // 2]:7.3f} "
                f"runs={[round(r, 3) for r in runs]}",
                flush=True,
            )
        else:
            print(f"{name:40s} plan dumped (no timed runs)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
