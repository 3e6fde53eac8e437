#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the parquet
fixture tables registered as views, sorts columns by name and rows by value,
and reports exact-match / mismatch per query.  Dev-only tool (driver-side
python env); not part of the Spark library.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip through repr to catch -0.0 vs 0.0
        if v == 0:
            return "0.0"
        return repr(v)
    return repr(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return cols_sorted, out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = canon(spark_rel.columns, spark_rel.fetchall())
            duck_rel = con.sql(sql)
            d_cols, d_rows = canon(duck_rel.columns, duck_rel.fetchall())
        except Exception as e:
            bad.append((name, f"ERROR {e}"))
            continue
        if s_cols != d_cols:
            bad.append((name, f"schema: spark={s_cols} duck={d_cols}"))
        elif s_rows != d_rows:
            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
            bad.append((name, f"rows: n_spark={len(s_rows)} n_duck={len(d_rows)} "
                              f"first_diffs={diffs}"))
        else:
            ok.append((name, len(s_rows)))
    for name, n in ok:
        print(f"PASS {name} ({n} rows)")
    for name, why in bad:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(ok)}/{len(ok) + len(bad)} queries match")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
