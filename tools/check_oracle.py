"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()``
counterpart on DuckDB over the same parquet tables, then compares
row count, column names, and order-insensitive values (exact match
— the engine's parity conventions round/format everything that
could legitimately differ).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from pac_data_pipeline_spark.session import get_spark  # noqa: E402
from pac_data_pipeline_spark.sources.readers import TABLES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows — the
    order-insensitive canonical form."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        else:
            df[c] = s.astype(object).where(s.notna(), None)
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount: spark={len(spark_df)} duck={len(duck_df)}")
    # Dtype-kind parity: the driver hashes values dtype-sensitively, so a
    # DuckDB HUGEINT sum (float64 after fetchdf) vs a Spark bigint hashes
    # differently even when every value is equal ("3" vs "3.0"). Compare
    # numeric kind explicitly — this caught the round-2 h12/h_window_distinct/
    # x_chunk_dedup failures that exact-value equality was blind to.
    for c in sorted(spark_df.columns):
        sk = "f" if pd.api.types.is_float_dtype(spark_df[c]) else (
            "i" if pd.api.types.is_integer_dtype(spark_df[c]) else "o")
        dk = "f" if pd.api.types.is_float_dtype(duck_df[c]) else (
            "i" if pd.api.types.is_integer_dtype(duck_df[c]) else "o")
        if sk != dk and "o" not in (sk, dk):
            problems.append(
                f"dtype kind mismatch on {c!r}: spark={spark_df[c].dtype} "
                f"duck={duck_df[c].dtype} (cast the oracle SUM to BIGINT "
                f"or the Spark column to double)"
            )
    a, b = canon(spark_df), canon(duck_df)
    if len(a) == len(b):
        neq = (a.fillna("\x00") != b.fillna("\x00")).any(axis=1)
        if neq.any():
            i = neq.idxmax()
            problems.append(
                f"values differ in {int(neq.sum())}/{len(a)} rows; first at {i}:\n"
                f"  spark: {a.loc[i].to_dict()}\n  duck:  {b.loc[i].to_dict()}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(shuffle_partitions=8)
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"[FAIL] {name}: spark error: {exc}")
            n_bad += 1
            continue
        if name not in oracles:
            # Rows-only queries still flow through the driver's
            # canonicalizer (sort_values over every column) before it
            # records row count + schema, so an unsortable cell type
            # (ndarray/list) crashes the DRIVER even when no oracle
            # exists — CORRECTNESS_r06's x_multimodal_features failure
            # hid behind the old len(sdf) short-circuit here. Run the
            # same canon() locally so that class fails in this gate
            # first.
            try:
                canon(sdf)
            except Exception as exc:
                print(
                    f"[FAIL] {name}: rows-only output not canonicalizable "
                    f"(driver comparator would crash): {exc}"
                )
                n_bad += 1
                continue
            print(f"[rows-only] {name}: {len(sdf)} rows")
            n_rowsonly += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"[FAIL] {name}: duckdb error: {exc}")
            n_bad += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"[FAIL] {name}:")
            for p in problems:
                print(f"    {p}")
            n_bad += 1
        else:
            print(f"[ok] {name}: {len(sdf)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {n_rowsonly} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
