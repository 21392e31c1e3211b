"""Correctness one decade up: run every oracle query that only touches the
synthesized sf1 tables against DuckDB at /root/repo/.scale/sf1.

The sf0.01 driver gate proves semantics; the sf0.1 sweep already caught one
scale-revealed knife edge (CUSUM ordered float sums). This pushes the same
hash-compare one more decade: 50k docs / 20k embeddings / 1M events (plus
the sf1 TPC-H decade once scripts/gen_scale_data.py has produced it — the
gate auto-detects which tables exist in the target dir).

Queries whose full oracle is deliberately quadratic (all-pairs similarity
verification) run their SCALE PROBE instead (queries.SCALE_PROBES): the
engine's full-scale output is value-checked on a deterministic md5-anchored
slice whose oracle is linear in n — zero SKIPs by design. The watchdog
remains as a backstop for anything unexpectedly slow.

Usage: python scripts/sf1_gate.py [sf_dir] [--timeout N]
"""

from __future__ import annotations

import re
import sys
import threading
import time

import duckdb

sys.path.insert(0, "/root/repo")

from mongo_iceberg_lakehouse_spark.queries import (  # noqa: E402
    REGISTRY,
    SCALE_PROBES,
)
from mongo_iceberg_lakehouse_spark.session import get_spark  # noqa: E402
from tests.compare import compare_spark_duckdb  # noqa: E402

ALL_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def gate_tables(sf_dir: str) -> list[str]:
    import os

    return [
        t for t in ALL_TABLES if os.path.exists(f"{sf_dir}/{t}.parquet")
    ]


def sf1_eligible(name: str, present: list[str]) -> bool:
    import inspect

    q = REGISTRY[name]
    if q.oracle is None:
        return False
    text = q.oracle + inspect.getsource(q.fn)
    for t in ALL_TABLES:
        if t in present:
            continue
        if re.search(rf"\b{t}\b", text):
            return False
    return True


def run_gate(
    sf_dir: str,
    timeout: int = 300,
    spark=None,
    only=None,
    stop_spark_before_oracle: bool = False,
) -> tuple[int, int, int]:
    """Run the gate; returns (fails, skips, total). Importable so the
    pytest -m scale wrapper (tests/test_scale_gates.py) shares this exact
    code path with the CLI. ``only`` restricts to a name subset (the sf10
    gate runs the scaling-curve set, not all 260 oracles — one decade up
    from the full sf1 gate, value-checking the scale-critical families)."""
    present = gate_tables(sf_dir)
    names = sorted(n for n in REGISTRY if sf1_eligible(n, present))
    if only is not None:
        unknown = set(only) - set(REGISTRY)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        names = [n for n in names if n in set(only)]
    print(
        f"# {len(names)} sf1-eligible oracle queries over {present}",
        flush=True,
    )
    own_spark = spark is None
    if own_spark:
        spark = get_spark(
            app_name="sf1-gate",
            # the gate COLLECTS full query outputs to hash-compare; at
            # sf100 a 5M-row rebuilt-text output serializes to multiple
            # GB, over the 1g maxResultSize default (round-7: span_scrub
            # false-FAILed the gate on the harness limit, not the engine)
            extra_confs={"spark.driver.maxResultSize": "16g"},
        )
    spark.sparkContext.setLogLevel("ERROR")

    # DuckDB's out-of-core phase fragments into >64k mmaps on the biggest
    # verification oracles (sf10 span-scrub) and the kernel default
    # vm.max_map_count=65530 turns that into a spurious bad_alloc with
    # 100+ GB free (diagnosed round 5 by watching /proc/self/maps hit the
    # ceiling). SYSTEM-WIDE SIDE EFFECT (documented in README, gate
    # section): only raised when the current value is lower, logged when
    # applied, best-effort (non-root hosts skip silently).
    _MAP_COUNT_FLOOR = 1048576
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            current = int(f.read().strip())
        if current < _MAP_COUNT_FLOOR:
            with open("/proc/sys/vm/max_map_count", "w") as f:
                f.write(str(_MAP_COUNT_FLOOR))
            print(
                f"# raised vm.max_map_count {current} -> {_MAP_COUNT_FLOOR} "
                "(system-wide, not restored; DuckDB out-of-core mmap "
                "headroom)",
                flush=True,
            )
    except (OSError, ValueError):
        pass

    def fresh_con(big: bool = False):
        # Fresh connection per query: sf10 showed a big oracle can OOM
        # DuckDB and leave the shared connection's allocator poisoned for
        # every later (tiny) query. Spill-to-disk + an explicit budget
        # make large verification oracles out-of-core instead of fatal.
        c = duckdb.connect()
        c.execute("SET temp_directory='/tmp/duckdb_gate_spill'")
        # 16GB + 8 threads by default, NOT bigger: DuckDB's list/LATERAL
        # intermediates are partly untracked, and per-thread buffers
        # multiply them — at sf10 the span-scrub oracle malloc-failed the
        # whole box under 48GB x 32 threads but finishes in 36 s under
        # this budget (the limit forces early spilling, which the
        # untracked share then rides within). In --fresh-oracle-disk mode
        # the Spark JVM is STOPPED before the oracle runs, so ~120 GB of
        # RAM is free and the budget rises to 64GB (still 8 threads — the
        # r5 malloc failure was the 32-thread multiplier, not the limit):
        # the sf100 bpe-pair oracle spilled past 56 GB of DISK under the
        # 16GB budget (round-8), and a larger in-memory share is the only
        # lever left once the disk is already exclusively the oracle's.
        # env overrides (round-9; the r8 commit named these but the code
        # never landed): LIST-heavy oracles carry an UNTRACKED allocation
        # share of roughly the tracked budget again, so the right big
        # budget is workload-dependent — semdedup at sf100 OOM-killed the
        # box under 64GB tracked (~128GB real) where 24GB fits
        import os as _os

        mem = _os.environ.get(
            "SPARK_GRAFT_GATE_ORACLE_MEM", "64GB" if big else "16GB"
        )
        thr = _os.environ.get("SPARK_GRAFT_GATE_ORACLE_THREADS", "8")
        c.execute(f"SET memory_limit='{mem}'")
        c.execute(f"SET threads={thr}")
        for t in present:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        return c

    if stop_spark_before_oracle and len(names) > 1:
        raise SystemExit(
            "--fresh-oracle-disk runs one query per process (the JVM is "
            "stopped after the engine collect); pass a single --only name"
        )
    fails = skips = 0
    for name in names:
        q = SCALE_PROBES.get(name, REGISTRY[name])
        df = q.fn(spark, sf_dir)
        con = fresh_con()
        timed_out = [False]

        def watchdog():
            timed_out[0] = True
            try:
                con.interrupt()
            except Exception:
                # con can be mid-rebind (closed, fresh big-budget one not
                # yet bound) in --fresh-oracle-disk phase 2; the rebind
                # path re-checks timed_out right after binding so the
                # timeout still lands even when this interrupt is lost
                pass
            try:
                spark.sparkContext.cancelAllJobs()
            except Exception:
                pass  # context already stopped (fresh-oracle-disk phase 2)

        timer = threading.Timer(timeout, watchdog)
        timer.start()
        t0 = time.time()
        try:
            if stop_spark_before_oracle:
                # sf100 within-query disk bind: a single query's shuffle
                # blocks (tens of GB) and the DuckDB oracle's out-of-core
                # spill otherwise share the disk SIMULTANEOUSLY. Collect
                # the engine side, STOP the JVM (its shutdown hook deletes
                # blockmgr/shuffle dirs synchronously), then run the
                # oracle with the whole disk.
                from tests.compare import _collect_tuples, compare_rows_duckdb

                scols = list(df.columns)
                srows = _collect_tuples(df)
                spark.stop()
                # the JVM (and its ~24 GB heap) is gone: rebuild the
                # oracle connection with the big-RAM budget so it spills
                # less (the watchdog closure reads `con` at call time, so
                # rebinding keeps the interrupt pointed at the live one)
                con.close()
                con = fresh_con(big=True)
                if timed_out[0]:
                    # watchdog fired in the close->rebind window: its
                    # interrupt hit the dead connection (guarded no-op),
                    # so honor the timeout here instead of running a
                    # big-budget oracle with no cancellation path
                    raise TimeoutError("watchdog fired during oracle rebind")
                ok, msg = compare_rows_duckdb(scols, srows, con, q.oracle)
            else:
                ok, msg = compare_spark_duckdb(df, con, q.oracle)
        except Exception as exc:  # noqa: BLE001
            if timed_out[0]:
                skips += 1
                print(f"SKIP {name}: timeout >{timeout}s", flush=True)
                timer.cancel()
                continue
            # 1200 chars: py4j prefixes ~90 chars of wrapper before the
            # actual Java exception class/message — 200 cut it off
            ok, msg = False, "error: " + " | ".join(
                str(exc)[:1200].splitlines()
            )
        finally:
            timer.cancel()
        status = "OK" if ok else "FAIL"
        if name in SCALE_PROBES:
            status += "(probe)"
        if not ok:
            fails += 1
        print(f"{status} {name}: {msg} [{time.time()-t0:.1f}s]", flush=True)
        con.close()
    print(
        f"\n{fails} failures, {skips} oracle-timeouts / {len(names)} "
        f"sf1-eligible queries at {sf_dir}",
        flush=True,
    )
    if own_spark:
        spark.stop()
    return fails, skips, len(names)


def main() -> int:
    timeout = 300
    only = None
    args = sys.argv[1:]
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = int(args[i + 1])
        del args[i:i + 2]
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        del args[i:i + 2]
    if "--curve" in args:
        # the scaling-curve set (scripts/scaling_curve.py QUERIES)
        from scripts.scaling_curve import QUERIES as CURVE

        only = list(CURVE)
        args.remove("--curve")
    fresh_disk = "--fresh-oracle-disk" in args
    if fresh_disk:
        args.remove("--fresh-oracle-disk")
    sf_dir = args[0] if args else "/root/repo/.scale/sf1"
    fails, _skips, _total = run_gate(
        sf_dir, timeout, only=only, stop_spark_before_oracle=fresh_disk
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
