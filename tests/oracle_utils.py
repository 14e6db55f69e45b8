"""Local mirror of the driver's correctness gate: run a registered Spark
query and its DuckDB oracle on the same parquet tables, compare row count,
column names, and an order-insensitive value multiset."""

from __future__ import annotations

import math

import duckdb

from genpipe_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str):
    import os

    con = duckdb.connect()
    # in-memory DuckDB cannot spill without an explicit temp dir; the
    # sf10 fixture oracles (1e8-row token/shingle CTEs) need it when
    # pytest/Spark hold most of the box's RAM
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLE_NAMES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            # Spark-written tables are directories of part files (the
            # .localdata scaled fixtures); driver testdata are single
            # files — glob only in the directory case
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con.execute(sql).fetchdf()


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def driver_canon_ok(pdf) -> str | None:
    """Replicate the driver's canonicalizer (pandas sort_values over ALL
    columns): top-level array/map/struct cells make it raise 'unhashable
    type' (VERDICT r01 — 6 queries crashed this way). Returns the error
    string, or None if the frame canonicalizes."""
    try:
        pdf.sort_values(by=sorted(pdf.columns))
        return None
    except Exception as e:  # noqa: BLE001
        return f"driver-canon: {e!r}"


def compare(spark_df, oracle_pdf) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems = []
    spdf = spark_df.toPandas()
    canon_err = driver_canon_ok(spdf)
    if canon_err:
        problems.append(canon_err)
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"rowcount: spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = canonical_rows(spdf), canonical_rows(oracle_pdf)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        problems.append(f"values: spark-only={diff_a} oracle-only={diff_b}")
    return problems
