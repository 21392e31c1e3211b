"""Dump .explain("formatted") for named queries to plans/r10/<q>_<tag>.txt.

Usage: python scripts/explain_one.py <tag> q1,q2,... [sf_dir]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from mongo_iceberg_lakehouse_spark.queries import REGISTRY  # noqa: E402
from mongo_iceberg_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="explain-one")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"/root/repo/plans/r10/{name}_{tag}.txt"
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out} ({txt.count('Exchange')} Exchange lines)")
    spark.stop()


if __name__ == "__main__":
    main()
