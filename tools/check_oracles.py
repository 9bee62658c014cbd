#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

<verifyOutDir> is what `graft.Verify` wrote: one parquet dir per query
plus oracle_sql.json. For each query: run the oracle SQL in DuckDB over
views named after the parquet tables in <sfDir>, then compare against
the Spark result — same row count, same column names (sorted), and
value-equal rows (exact; tiny float diffs reported separately).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: float(v) if hasattr(v, "as_tuple") else v)  # Decimal
    return df


def rows_equal(a, b) -> tuple[bool, str]:
    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    if list(a.columns) != list(b.columns):
        return False, f"cols {list(a.columns)} vs {list(b.columns)}"
    # the driver's hash tolerates integer-width differences (int32 rank
    # vs BIGINT row_number passed round 1) but NOT kind differences —
    # DuckDB HUGEINT arrives as float64 and hash-mismatches integer
    # results even when values agree. Flag kind mismatches.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb:
            return False, (f"dtype kind col {c}: spark={a[c].dtype} "
                           f"oracle={b[c].dtype} (HUGEINT leak? cast the "
                           f"oracle aggregate)")
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    rel = abs(x - y) / max(abs(x), abs(y), 1e-300)
                    return False, (f"col {c} row {i}: {x!r} != {y!r} "
                                   f"(rel {rel:.2e})")
            elif x != y:
                return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, ""


def main():
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    con = duckdb.connect()
    for p in sorted(sf_dir.glob("*.parquet")):
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    n_ok = n_bad = n_noora = 0
    for qdir in sorted(d for d in out_dir.iterdir() if d.is_dir()):
        name = qdir.name
        spark_df = pd.read_parquet(qdir)
        if name not in oracle:
            print(f"NOORACLE {name}: rows={len(spark_df)}")
            n_noora += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORAFAIL  {name}: {e}")
            n_bad += 1
            continue
        ok, why = rows_equal(normalize(spark_df), normalize(duck_df))
        if ok:
            print(f"OK       {name}: rows={len(spark_df)}")
            n_ok += 1
        else:
            print(f"MISMATCH {name}: {why}")
            n_bad += 1
    missing = set(oracle) - {d.name for d in out_dir.iterdir() if d.is_dir()}
    for name in sorted(missing):
        print(f"NOSPARK  {name} (oracle present, no Spark output)")
        n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_noora} rows-only")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
