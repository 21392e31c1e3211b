"""Dump .explain("formatted") for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python scripts/explain_one.py <tag> q1,q2,... [sf_dir] [round_dir]

Paths derive from this file's location (r10 advice: no hardcoded checkout
paths); the plan text comes from io-captured ``df.explain`` with a guarded
fallback to the private PythonSQLUtils call for older builds.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mongo_iceberg_lakehouse_spark.queries import REGISTRY  # noqa: E402
from mongo_iceberg_lakehouse_spark.session import get_spark  # noqa: E402


def _plan_text(df) -> str:
    try:  # public API: capture explain()'s stdout
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        if txt.strip():
            return txt
    except Exception:
        pass
    # fallback for builds where redirect fails (py4j writes to the JVM fd)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    round_dir = sys.argv[4] if len(sys.argv) > 4 else "r11"
    out_dir = os.path.join(REPO, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-one")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        txt = _plan_text(df)
        out = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out} ({txt.count('Exchange')} Exchange lines)")
    spark.stop()


if __name__ == "__main__":
    main()
