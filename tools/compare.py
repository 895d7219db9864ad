#!/usr/bin/env python3
"""Local mini-verify: mimic the driver's t2 gate.

Reads each query's parquet dump (written by graft.Verify), runs the matching
DuckDB oracle SQL from oracle_sql.json against the same sf dir, sorts columns
by name, and compares values exactly. Usage:
  python3 tools/compare.py <sfDir> <verifyOutDir> [--budget SECONDS]

--budget caps each ORACLE's wall-clock (via duckdb interrupt) for large-scale
sweeps where a deliberately-quadratic oracle formulation (e.g. the skyline
NOT EXISTS) would run for hours; a timed-out oracle is reported as SKIP, not
FAIL -- the engine result was still produced, only the oracle was too slow.
"""
import json
import math
import sys
import threading

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def dtype_family(dt) -> str:
    """Collapse a pandas dtype to the family the driver's hash is sensitive
    to: int vs float vs bool vs time vs object. An int/float disagreement
    (e.g. a DuckDB HUGEINT materializing as float64 against Spark's int64)
    flips the driver hash even when every value compares equal, so the local
    gate must reject it too."""
    k = dt.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in "mM":
        return "time"
    return "obj"


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if hasattr(a, "timestamp") and hasattr(b, "timestamp"):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return a == b


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = None
    if "--budget" in sys.argv:
        budget = float(sys.argv[sys.argv.index("--budget") + 1])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        # load the Spark dump OUTSIDE the budget window: the budget guards
        # the ORACLE only, and a timer armed during read_parquet would (a)
        # burn the budget before the oracle starts, (b) misreport a genuine
        # missing/corrupt-dump failure as SKIP, or (c) fire an interrupt
        # with no query running.
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: load error: {str(e)[:300]}")
            n_fail += 1
            continue
        timer = None
        timed_out = []
        if budget:
            timer = threading.Timer(
                budget, lambda: (timed_out.append(True), con.interrupt()))
            timer.start()
        try:
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            if timed_out:
                print(f"SKIP {name}: oracle exceeded {budget:.0f}s budget")
                n_skip += 1
            else:
                print(f"FAIL {name}: oracle exec error: {str(e)[:300]}")
                n_fail += 1
            continue
        finally:
            if timer:
                timer.cancel()
                # absorb a stray interrupt from a timer that fired in the
                # window after execute() returned but before cancel() — it
                # would otherwise abort the NEXT oracle
                if timed_out:
                    try:
                        con.execute("SELECT 1").fetchall()
                    except Exception:
                        pass
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            continue
        dtype_bad = None
        for c in spark_df.columns:
            sf, df_ = dtype_family(spark_df[c].dtype), dtype_family(duck_df[c].dtype)
            # 'obj' stays permissive: nullable ints, decimals and strings all
            # land there depending on the loader; values still compare below.
            if sf != df_ and "obj" not in (sf, df_):
                dtype_bad = (c, spark_df[c].dtype, duck_df[c].dtype)
                break
        if dtype_bad:
            c, sd, dd = dtype_bad
            print(f"FAIL {name}: dtype col={c}: spark={sd} duck={dd}")
            n_fail += 1
            continue
        bad = None
        for c in spark_df.columns:
            sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if not cell_eq(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    skip = f", {n_skip} skip (oracle budget)" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skip}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
