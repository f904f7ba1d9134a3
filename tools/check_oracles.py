"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, column
names, and an order-insensitive value hash over name-sorted columns."""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        d[c] = d[c].map(lambda v: repr(v))
    rows = sorted(d.apply(lambda r: "|".join(r), axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind == "f":
            out[c] = out[c].round(6)
        elif out[c].dtype.kind in "iu":
            out[c] = out[c].astype("int64")
        elif out[c].dtype == object:
            pass
    return out


def main(only=None):
    import __spark_entry__ as e
    from trustgraph_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark(cores=8)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = norm(fn(spark, sf_dir).toPandas())
        except Exception as ex:
            print(f"FAIL {name}: spark error {str(ex)[:300]}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = norm(con.sql(sql).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle error {str(ex)[:300]}")
            failures.append(name)
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{status} {name}: rows {len(sdf)}/{len(odf)} cols={ok_cols} hash={ok_hash}")
        if status == "FAIL":
            failures.append(name)
            if ok_cols and not ok_hash:
                cols = sorted(sdf.columns)
                a = sdf[cols].sort_values(cols).reset_index(drop=True)
                b = odf[cols].sort_values(cols).reset_index(drop=True)
                if len(a) == len(b):
                    neq = (a.astype(str) != b.astype(str)).any(axis=1)
                    print("  first diffs (spark vs oracle):")
                    print(a[neq].head(3).to_string())
                    print(b[neq].head(3).to_string())
                else:
                    print("  spark sample:", a.head(2).to_dict("records"))
                    print("  oracle sample:", b.head(2).to_dict("records"))
    spark.stop()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:]) or None))
