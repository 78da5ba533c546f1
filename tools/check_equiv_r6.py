"""Round-6 equivalence harness: prove an optimized query produces rows
identical to the pre-optimization implementation.

Compares sorted full result sets of the given queries across two env
settings (default = optimized; SPARK_JACCARD_DENSE=0 etc. = legacy path)
or across two git revisions when --legacy-env is not enough. Prints one
JSON line per (query, sf).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rows(df):
    cols = df.columns
    out = [tuple(r) for r in df.collect()]
    out.sort(key=lambda t: tuple((v is None, str(type(v)), v) for v in t))
    return cols, out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sfs", default="0.001,0.01,0.1")
    ap.add_argument("--env", default="SPARK_JACCARD_DENSE=0",
                    help="comma list of K=V toggling the legacy path")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from agr_loader_spark.session import get_spark

    spark = get_spark("equiv_r6")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    legacy_env = dict(kv.split("=", 1) for kv in args.env.split(","))
    rc = 0
    for sf in args.sfs.split(","):
        sf_dir = f"/root/testdata/sf{sf}"
        for name in args.queries:
            cols_new, new = _rows(qs[name](spark, sf_dir))
            saved = {k: os.environ.get(k) for k in legacy_env}
            os.environ.update(legacy_env)
            try:
                cols_old, old = _rows(qs[name](spark, sf_dir))
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
            ok = (cols_new == cols_old) and (new == old)
            print(json.dumps({
                "query": name, "sf": sf, "match": ok,
                "rows_new": len(new), "rows_old": len(old),
            }), flush=True)
            if not ok:
                rc = 1
                diff_n = [r for r in new if r not in set(old)][:3]
                diff_o = [r for r in old if r not in set(new)][:3]
                print(json.dumps({"query": name, "sf": sf,
                                  "only_new": [str(r) for r in diff_n],
                                  "only_old": [str(r) for r in diff_o]}))
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
