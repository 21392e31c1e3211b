"""Regenerate the query-count line in README.md from the live REGISTRY.

VERDICT r2 item 8: the README's hand-written counts drifted (215/196 vs an
actual 217/198). This keeps the shop window exact: run after registering
queries; the commit hook of record is simply "run this before committing
README-adjacent changes".

Usage: python scripts/gen_readme_counts.py [--check]
  --check  exit 1 if README.md is stale instead of rewriting it
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from mongo_iceberg_lakehouse_spark.queries import REGISTRY  # noqa: E402

README = "/root/repo/README.md"
PATTERN = re.compile(r"\d+ named queries \(\d+ DuckDB-oracle-checked\)")


def main() -> int:
    total = len(REGISTRY)
    with_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    want = f"{total} named queries ({with_oracle} DuckDB-oracle-checked)"
    text = open(README).read()
    if want in text:
        print(f"README up to date: {want}")
        return 0
    if not PATTERN.search(text):
        print("count line not found in README.md", file=sys.stderr)
        return 1
    if "--check" in sys.argv:
        print(f"README stale: wants {want!r}", file=sys.stderr)
        return 1
    open(README, "w").write(PATTERN.sub(want, text))
    print(f"README updated: {want}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
