"""Cross-revision output equality: run every declared query under the
round-5 tree AND the current tree in separate subprocesses (so module
caches can't mix), dump sorted row digests, and diff.

Usage: python tools/compare_r5_r6.py [--sf 0.01] [--trees /tmp/r5tree /root/repo]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import hashlib, json, sys
sys.path.insert(0, sys.argv[1])
import __spark_entry__ as e
from agr_loader_spark.session import get_spark
spark = get_spark("xrev", cores=32)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = sys.argv[2]
out = {}
for name, fn in e.queries().items():
    try:
        df = fn(spark, sf_dir)
        rows = sorted(
            json.dumps(r, default=str, sort_keys=True)
            for r in (row.asDict(recursive=True) for row in df.collect())
        )
        h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
        out[name] = {"rows": len(rows), "sha": h, "cols": df.columns}
    except Exception as ex:  # pragma: no cover
        out[name] = {"err": f"{type(ex).__name__}: {ex}"[:300]}
with open(sys.argv[3], "w") as f:
    json.dump(out, f)
spark.stop()
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--trees", nargs=2,
                    default=["/tmp/r5tree",
                             os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__)))])
    args = ap.parse_args()
    sf_dir = f"/root/testdata/sf{args.sf}"
    results = []
    for tree in args.trees:
        outf = tempfile.mktemp(suffix=".json")
        r = subprocess.run([sys.executable, "-c", WORKER, tree, sf_dir, outf],
                           capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            print(r.stderr[-2000:])
            return 2
        results.append(json.load(open(outf)))
        os.unlink(outf)
    old, new = results
    rc = 0
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        ok = o == n
        if not ok:
            rc = 1
        print(json.dumps({"query": name, "match": ok,
                          **({} if ok else {"old": o, "new": n})}))
    print(json.dumps({"sf": args.sf, "all_match": rc == 0,
                      "n_queries": len(old)}))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
