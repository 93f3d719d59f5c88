"""Dump .explain('formatted') for named queries to plans/<tag>/<q>_<suffix>.txt.

    python tools/capture_plans.py <tag> <suffix> q1 q2 ...
"""
from __future__ import annotations

import os
import sys


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    from gostatix_spark.session import get_spark

    qfns = entrymod.queries()
    spark = get_spark("capture-plans")
    os.makedirs(f"plans/{tag}", exist_ok=True)
    for name in names:
        df = qfns[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/{tag}/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        print(f"wrote plans/{tag}/{name}_{suffix}.txt "
              f"({plan.count('Exchange')} Exchange)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
