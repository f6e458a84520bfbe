#!/usr/bin/env python3
"""Driver-mimic verification (see .claude/skills/verify/SKILL.md).

Loads __spark_entry__.py the way the external driver does (importlib,
BARE SparkSession with none of the engine's configs), runs the smoke
entry(), then every queries() entry vs its oracle_sql() on DuckDB at
sf0.01 (or $VERIFY_SF_DIR), comparing row count, column set, and
order-insensitive values (floats via isclose, timestamps normalized).

Exit 0 = all match; nonzero = any mismatch. Prints one line per query.
"""

from __future__ import annotations

import datetime
import importlib.util
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        s = out[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            out[c] = s.dt.tz_convert("UTC").dt.tz_localize(None)
        elif s.dtype == object:
            nn = s.dropna()
            if len(nn) and isinstance(nn.iloc[0], (datetime.date, datetime.datetime)):
                out[c] = pd.to_datetime(s)
        if pd.api.types.is_datetime64_any_dtype(out[c].dtype):
            out[c] = out[c].astype("datetime64[us]")
    return out


def frames_match(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    if len(sdf) != len(odf):
        return False, f"rows spark={len(sdf)} oracle={len(odf)}"
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    b = odf[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    for c in cols:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av = a[c].astype(float).to_numpy()
            bv = b[c].astype(float).to_numpy()
            ok = np.all((np.isnan(av) & np.isnan(bv)) | np.isclose(av, bv, rtol=1e-9, atol=1e-9))
        else:
            ok = bool(((a[c].isna() & b[c].isna()) | (a[c].astype(object) == b[c].astype(object))).all())
        if not ok:
            return False, f"values differ in column {c}"
    return True, ""


def main() -> int:
    # $VERIFY_ENGINE_PATH (VERDICT r10 next-#7): resolve the ENGINE
    # package from an installed location (a wheel venv's
    # site-packages) instead of the source tree. __spark_entry__.py
    # inserts the repo at sys.path[0] when it executes, so path order
    # alone can't win — import the package from the given path FIRST;
    # the entry file's later imports then reuse the sys.modules entry.
    engine_path = os.environ.get("VERIFY_ENGINE_PATH")
    if engine_path:
        sys.path.insert(0, engine_path)
        import sports_betting_data_pipeline_spark as _eng

        if not os.path.abspath(_eng.__file__).startswith(
            os.path.abspath(engine_path)
        ):
            print(f"ENGINE PROVENANCE FAIL: {_eng.__file__} "
                  f"not under {engine_path}")
            return 2
        print(f"ENGINE: {_eng.__file__}")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    smoke = mod.entry(spark)
    n_smoke = len(smoke.collect())
    print(f"SMOKE entry(): rows={n_smoke} cols={len(smoke.columns)}")
    failed = n_smoke <= 0

    con = duckdb.connect()
    for t in TABLES:
        # dir-shaped tables (part files under <t>.parquet/ — the sf1
        # fixture layout) need a glob; single-file tables read as-is
        tbl = f"{SF}/{t}.parquet"
        src = f"{tbl}/*.parquet" if os.path.isdir(tbl) else tbl
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    only = sys.argv[1:]  # optional query-name filters
    qs, osql = mod.queries(), mod.oracle_sql()
    report: dict[str, dict] = {}
    for name in sorted(qs):
        if only and not any(s in name for s in only):
            continue
        t0 = time.perf_counter()
        try:
            sdf = norm(qs[name](spark, SF).toPandas())
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            report[name] = {"status": "spark_error", "err": f"{type(exc).__name__}: {exc}"}
            failed = True
            continue
        finally:
            # g01/g02/sql04/pl02 cache intermediates that nothing
            # outside their own query reads — don't let storage
            # memory accumulate over the full-catalog sweep
            spark.catalog.clearCache()
        sec = round(time.perf_counter() - t0, 2)
        if name not in osql:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            report[name] = {"status": "rows_only", "rows": len(sdf), "sec": sec}
            if len(sdf) == 0:
                print(f"{name}: WARNING zero rows")
            continue
        odf = norm(con.execute(osql[name]).fetch_df())
        ok, why = frames_match(sdf, odf)
        tag = "MATCH" if ok else f"MISMATCH {why}"
        if len(sdf) == 0 and ok:
            tag += " (WARNING zero rows)"
        print(f"{name}: {tag} ({len(sdf)} rows)")
        report[name] = {
            "status": "match" if ok else "mismatch",
            "rows": len(sdf),
            "oracle_rows": len(odf),
            "sec": sec,
            "detail": why,
        }
        failed = failed or not ok
    print("RESULT:", "FAIL" if failed else "PASS")
    # Optional JSON artifact (the sf1 regime-switch parity evidence,
    # VERDICT r9 next-#1): $VERIFY_JSON_OUT=<path> dumps per-query
    # status + the fixture dir the check ran against.
    json_out = os.environ.get("VERIFY_JSON_OUT")
    if json_out:
        import json as _json

        with open(json_out, "w") as fh:
            _json.dump(
                {"sf_dir": SF, "result": "FAIL" if failed else "PASS",
                 "queries": report},
                fh, indent=1, sort_keys=True,
            )
        print(f"report -> {json_out}")
    if not only:
        # Keep COVERAGE.md's driver-status table in lockstep with the
        # committed CORRECTNESS_r*.json artifacts: regenerating it on
        # every full verify run means the table can never contradict
        # the artifacts again (VERDICT r5 wrong-#1 — it was generated
        # once and went stale the moment a new driver artifact landed).
        try:
            scripts_dir = os.path.dirname(os.path.abspath(__file__))
            if scripts_dir not in sys.path:
                sys.path.insert(0, scripts_dir)
            import coverage_status

            coverage_status.main()
        except Exception as exc:  # noqa: BLE001
            print(f"WARNING: coverage_status refresh failed: {exc}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
