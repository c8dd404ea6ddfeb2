#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each Verify
result parquet, run the corresponding oracle SQL in DuckDB over the same
testdata tables, sort columns by name, and compare values row by row.
Usage: check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def frame_rows(df):
    df = df[sorted(df.columns)]
    out = []
    for row in df.itertuples(index=False):
        out.append("\t".join(norm_cell(v) for v in row))
    return out


def dtype_parity_errors(got, want):
    """The driver materializes the oracle via pandas, where DuckDB HUGEINT
    (SUM over BIGINT without an outer CAST) becomes float64 — so a column
    that is integral on the Spark side but floating on the oracle side
    hash-mismatches at the driver even when every value is equal. Flag
    that class loudly instead of relying on the repr diff."""
    errs = []
    # case-insensitive column matching, mirroring the column-name gate
    # below — an alias whose case differs between Spark and DuckDB must
    # not silently escape the dtype check
    want_by_lower = {c.lower(): c for c in want.columns}
    for c in got.columns:
        wc = want_by_lower.get(c.lower())
        if wc is None:
            continue
        g_int = pd.api.types.is_integer_dtype(got[c])
        g_flt = pd.api.types.is_float_dtype(got[c])
        w_int = pd.api.types.is_integer_dtype(want[wc])
        w_flt = pd.api.types.is_float_dtype(want[wc])
        if g_int and w_flt:
            errs.append(f"column '{c}': spark integral vs oracle float64 "
                        "(HUGEINT widening — missing outer CAST(SUM(..) AS BIGINT)?)")
        elif g_flt and w_int:
            errs.append(f"column '{c}': spark floating vs oracle integral")
    return errs


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            # .df() is the driver's materialization path: HUGEINT → float64.
            # (.arrow() keeps HUGEINT integral and CANNOT see the missing-cast
            # class — do not switch back.)
            want = con.sql(sql).df(date_as_object=True)
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        dterrs = dtype_parity_errors(got, want)
        g, w = frame_rows(got), frame_rows(want)
        if dterrs:
            print(f"FAIL {name}: dtype parity — " + "; ".join(dterrs))
            n_fail += 1
        elif sorted(got.columns.str.lower()) != sorted(want.columns.str.lower()):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            n_fail += 1
        elif g == w:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark: {a}\n    duck : {b}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
