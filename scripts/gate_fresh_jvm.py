"""Fresh-JVM-per-query wrapper around scripts/sf1_gate.py.

Round-7 carry-over (docs/SF100_GATE_r07.log, VERDICT r7 #2): a long-lived
gate session accumulates Spark shuffle blocks — ~50 GB at sf100 — on the
same filesystem DuckDB's out-of-core verification oracles spill to, so the
five heaviest sf100 value checks died on spill ENOSPC even though every
compare that completed was green. That is a harness capacity limit, not an
engine or oracle defect: each query alone fits the disk.

This wrapper gives every query its own JVM: the subprocess runs exactly one
query through run_gate (same code path, same probes/timeouts/limits) and
exits, so Spark's shutdown hook deletes its shuffle/blockmgr dirs before
the NEXT query's oracle needs the disk. Between queries the DuckDB spill
dir is also cleared. ~20 s of session boot per query is the price; at sf100
the queries are minutes each, so the overhead is noise.

Usage:
  python scripts/gate_fresh_jvm.py <sf_dir> [--timeout N] [--curve]
                                   [--only a,b,c] [--log path]

Exit status 1 if any query FAILs (timeouts are reported as SKIP, matching
sf1_gate).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPILL_DIR = "/tmp/duckdb_gate_spill"


def query_list(args: list[str]) -> list[str]:
    sys.path.insert(0, REPO)
    if "--curve" in args:
        from scripts.scaling_curve import QUERIES

        return list(QUERIES)
    if "--only" in args:
        i = args.index("--only")
        return args[i + 1].split(",")
    raise SystemExit("pass --curve or --only a,b,c")


def main() -> int:
    args = sys.argv[1:]
    timeout = "1800"
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = args[i + 1]
    log_path = None
    if "--log" in args:
        i = args.index("--log")
        log_path = args[i + 1]
    sf_dir = next(
        (a for a in args if not a.startswith("--") and os.path.isdir(a)),
        None,
    )
    if sf_dir is None:
        raise SystemExit("no sf_dir given")
    names = query_list(args)
    log = open(log_path, "a", buffering=1) if log_path else None

    def emit(line: str) -> None:
        print(line, flush=True)
        if log:
            log.write(line + "\n")

    emit(f"# fresh-JVM gate: {len(names)} queries at {sf_dir}, "
         f"timeout {timeout}s/query")
    fails = 0
    for name in names:
        shutil.rmtree(SPILL_DIR, ignore_errors=True)
        t0 = time.time()
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "sf1_gate.py"),
                sf_dir,
                "--only",
                name,
                "--timeout",
                timeout,
                # collect the engine side, STOP the JVM (shuffle dirs are
                # deleted synchronously by its shutdown hook), then run
                # the DuckDB oracle with the whole disk — a single sf100
                # query's shuffle + the oracle's spill otherwise share
                # the disk simultaneously (round-8 within-query ENOSPC)
                "--fresh-oracle-disk",
            ],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        wall = time.time() - t0
        # forward the per-query verdict lines (OK/FAIL/SKIP), drop the boot
        # noise; keep stderr tail on a non-zero exit for diagnosis
        verdicts = [
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith(("OK", "FAIL", "SKIP"))
        ]
        for ln in verdicts:
            emit(f"{ln}  [jvm {wall:.0f}s]")
        if proc.returncode == 0 and not verdicts:
            # rows-only queries (no oracle) are not sf1-eligible inside
            # run_gate — make the non-check visible instead of silent
            emit(f"NOOP {name}: no oracle (rows-only family)  "
                 f"[jvm {wall:.0f}s]")
        if proc.returncode != 0:
            fails += 1
            if not any(v.startswith("FAIL") for v in verdicts):
                tail = "\n".join(proc.stderr.splitlines()[-5:])
                emit(f"FAIL {name}: subprocess rc={proc.returncode}\n{tail}")
    shutil.rmtree(SPILL_DIR, ignore_errors=True)
    emit(f"\n# {fails} failing queries / {len(names)} at {sf_dir} "
         "(fresh JVM per query)")
    if log:
        log.close()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
