"""Local reimplementation of the driver's oracle check: run the Spark query
and the DuckDB SQL over the same parquet tables, sort columns by name, sort
rows, compare values (exact for ints/strings/dates, tolerant for floats —
the queries themselves round so exact match is expected)."""

from __future__ import annotations

import math
import os

import duckdb

from flow_pipeline_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).df()


def compare(spark_df, oracle_df, *, float_tol: float = 1e-9) -> list[str]:
    """Return list of mismatch descriptions (empty == match)."""
    problems = []
    sp = spark_df.toPandas()
    if sorted(map(str.lower, sp.columns)) != sorted(map(str.lower, oracle_df.columns)):
        problems.append(
            f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    # normalize: lowercase col names, sort columns, sort rows
    def norm(df):
        df = df.copy()
        df.columns = [c.lower() for c in df.columns]
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), ignore_index=True)
    sp, od = norm(sp), norm(oracle_df)
    if len(sp) != len(od):
        problems.append(f"row count: spark={len(sp)} oracle={len(od)}")
        return problems
    for col in sp.columns:
        a, b = sp[col], od[col]
        for i in range(len(a)):
            x, y = a.iloc[i], b.iloc[i]
            if x is None and y is None:
                continue
            if isinstance(x, float) or isinstance(y, float):
                fx = float(x) if x is not None else math.nan
                fy = float(y) if y is not None else math.nan
                if math.isnan(fx) and math.isnan(fy):
                    continue
                # round-7 review: NaN/inf arithmetic silently PASSED the
                # old `abs(fx-fy) > tol` form (nan > t is False; inf-inf
                # is nan; inf > tol*inf is False) — a NULL-vs-value or
                # inf-vs-value divergence green-lit the oracle. One-side
                # NaN and any non-finite value is a mismatch unless
                # exactly equal (inf == inf passes, inf vs -inf fails).
                if math.isnan(fx) or math.isnan(fy):
                    problems.append(f"{col}[{i}]: {x!r} != {y!r}")
                elif not (math.isfinite(fx) and math.isfinite(fy)):
                    if fx != fy:
                        problems.append(f"{col}[{i}]: {x!r} != {y!r}")
                elif abs(fx - fy) > float_tol * max(1.0, abs(fx), abs(fy)):
                    problems.append(f"{col}[{i}]: {x!r} != {y!r}")
            else:
                sx, sy = str(x), str(y)
                # date vs midnight-timestamp representation of DATE cols
                if sy.endswith(" 00:00:00"):
                    sy = sy[:-9]
                if sx.endswith(" 00:00:00"):
                    sx = sx[:-9]
                if sx != sy:
                    problems.append(f"{col}[{i}]: {x!r} != {y!r}")
            if len(problems) > 5:
                return problems
    return problems
