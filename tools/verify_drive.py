#!/usr/bin/env python
"""Hostile-session full drive of the driver contract — the verify
recipe as one command.

Runs every ``__spark_entry__.queries()`` entry through a DRIVER-shaped
session (America/New_York timezone on purpose — catches tz leaks; the
registry must pin UTC itself) and compares each oracle-backed query
against DuckDB at sf0.01 with the exact local harness (column-sorted,
row-sorted, dtype-kind-checked, check_exact — strictly stronger than
the driver's value hash). Rows-only queries must simply run.

Usage:
    python tools/verify_drive.py              # full drive (~5 min)
    python tools/verify_drive.py name1 name2  # targeted re-drive (~20 s)

Exit code 0 iff everything passed; failures print per query.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ["TZ"] = "America/New_York"
time.tzset()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")


class _Shim:
    def __init__(self, name: str, build, oracle: str) -> None:
        self.name, self.build, self.oracle = name, build, oracle


def main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from tests.oracle_harness import compare

    qs, osql = E.queries(), E.oracle_sql()
    names = argv or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    if not argv:  # full drive includes the entry smoke
        n = E.entry(spark).count()
        assert n > 0, "entry() returned no rows"
        print(f"entry smoke OK ({n} rows)")

    fails: list[tuple[str, str]] = []
    t0 = time.perf_counter()
    for name in names:
        try:
            if name in osql:
                compare(spark, _Shim(name, qs[name], osql[name]), SF_DIR)
            else:
                # rows-only check: executes the full plan end-to-end; any
                # exception is the failure signal (count() can't tell us
                # more — the 10 oracle-less specs are nondeterministic by
                # design and their VALUE semantics live in pytest).
                qs[name](spark, SF_DIR).count()
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            fails.append((name, f"{type(e).__name__}: {str(e)[:200]}"))
    dt = time.perf_counter() - t0
    print(
        f"drive complete: {len(names)} queries "
        f"({sum(1 for n in names if n in osql)} oracle-exact, "
        f"{sum(1 for n in names if n not in osql)} rows-only) "
        f"in {dt:.0f}s; FAILURES: {len(fails)}"
    )
    for name, err in fails:
        print(f"  FAIL {name}: {err}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
