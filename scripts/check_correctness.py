"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + sorted-column value hash, order-insensitive)."""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    df = res.to_pandas()  # ray Dataset
    if len(df.columns) == 0 and len(df) == 0:
        # Ray's to_pandas drops columns for an all-empty Dataset even
        # when ds.schema() is intact — rebuild the empty frame from the
        # schema so empty results still schema-compare faithfully
        try:
            df = pd.DataFrame({n: pd.Series(dtype=object)
                               for n in res.schema().names})
        except Exception:
            pass
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    if len(df) == 0:  # apply(axis=1) on 0 rows yields a DataFrame
        return hashlib.sha256(b"").hexdigest()[:16]
    rows = df.astype(str).apply(lambda r: "|".join(r), axis=1).sort_values()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = e.queries(), e.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ROWS-ONLY {name}: {len(got)} rows, cols={sorted(got.columns)}")
            continue
        try:
            exp = con.sql(sqls[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: ORACLE raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(exp)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(got)}/{len(exp)} cols_match={ok_cols} hash_match={ok_hash}"
        )
        if not ok_hash and ok_rows and ok_cols:
            merged = got[sorted(got.columns)].round(8)
            print("  got head:\n", merged.head(3).to_string())
            print("  exp head:\n", exp[sorted(exp.columns)].round(8).head(3).to_string())
    ray.shutdown()
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(*sys.argv[1:]) else 0)
