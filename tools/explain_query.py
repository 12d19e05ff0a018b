"""Dump .explain('formatted') for named bench/gate queries to files.

Usage:
    python tools/explain_query.py out_dir suffix name1 name2 ...

Writes ``out_dir/<name>_<suffix>.txt`` for each query name resolvable
through bench.QUERIES. Queries that execute their own jobs and return
None (write-path benches) are recorded as such — their plan evidence is
the code plus the sub-phase timings.

Plan-inspection mode: operators that return eager localCheckpoint
leaves (functions/_scope.py) hide their plan from .explain(); flip
_scope.PLAN_INSPECTION so the LAZY plan is returned, and clear the
cache afterwards (the documented test-mode contract).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from ngff_zarr_spark.functions import _scope  # noqa: E402
from ngff_zarr_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain")
    _scope.PLAN_INSPECTION = True
    try:
        for name in names:
            fn = bench.QUERIES[name]
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            try:
                df = fn(spark, sf_dir)
            except Exception as exc:  # noqa: BLE001 - record, keep going
                with open(path, "w") as fh:
                    fh.write(f"ERROR building {name}: {type(exc).__name__}: {exc}\n")
                print(f"# {name}: ERROR {exc}", file=sys.stderr)
                continue
            with open(path, "w") as fh:
                if df is None:
                    fh.write(
                        f"{name}: executes its own jobs (write-path bench); "
                        "no single final plan — see code + phase timings\n"
                    )
                else:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    ))
            spark.catalog.clearCache()
            print(f"# wrote {path}", file=sys.stderr)
    finally:
        _scope.PLAN_INSPECTION = False


if __name__ == "__main__":
    main()
