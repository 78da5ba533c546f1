"""Round-6 optimization harness (bench.py is frozen for measurement).

Isolates individual declared queries with the noop sink (guide §1.4),
times warm reps, and optionally dumps .explain("formatted") to
plans/r06/<query>_<tag>.txt. Prints one JSON line per query.

Usage:
  python bench_extra.py [--sf /root/testdata/sf1.0] [--reps 3]
                        [--plans-tag before] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-tag", default=None,
                    help="if set, write plans/r06/<q>_<tag>.txt")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from agr_loader_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.queries or list(qs)
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = qs[name](spark, args.sf)
        if args.plans_tag:
            plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "plans", "r06")
            os.makedirs(plan_dir, exist_ok=True)
            with open(os.path.join(plan_dir, f"{name}_{args.plans_tag}.txt"),
                      "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

        def run_once():
            # build + execute, same convention as bench.py (eager work at
            # construction belongs inside the timing)
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite").save()

        run_once()  # warm
        reps = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            run_once()
            reps.append(round(time.monotonic() - t0, 3))
        out[name] = {"median": statistics.median(reps), "reps": reps}
        print(json.dumps({"query": name, "sf": args.sf, **out[name]}),
              flush=True)
    print(json.dumps({"summary": {k: v["median"] for k, v in out.items()},
                      "sf": args.sf}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
