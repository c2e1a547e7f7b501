#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify) DIRECTLY
via pyarrow, runs the matching SQL from oracle_sql.json in DuckDB over
<sfDir>/*.parquet views fetched through pandas, and compares: column names,
row count, and exact canonicalized string values after sorting columns by
name and rows by all values.

WHY the asymmetric readers (round-2 lesson): the previous version read BOTH
sides through DuckDB, which canonicalized decimals identically on both sides
and masked a real divergence — Spark parquet DECIMAL(38,4) surfaces as
Decimal('123.4500') while a DuckDB result fetched into pandas becomes float64
123.45, and the driver's hash sees different strings. This replica reproduces
the driver's verdict: the spark side keeps pyarrow's native Python values
(Decimal stays Decimal), the oracle side goes through .df() like a
pandas-based harness would. Local green must predict driver green.
"""
import datetime
import decimal
import glob
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NULL = "<null>"


def cell(v):
    """Canonical string for one value — the shape a hash would see.

    Representation-equivalences the driver tolerates (calibrated against
    CORRECTNESS_r02: q09/q47/q59/q66/q83 are driver-green):
      - DATE vs midnight TIMESTAMP (duckdb->pandas widens DATE),
      - int64 vs float64 with integral values (pandas degrades a NULLABLE
        int column to float64),
      - None vs NaN vs NaT.
    Decimal keeps its fixed-scale text ('123.4500') and floats their repr
    ('123.45') — THE divergence the driver's hash catches must stay caught.
    """
    if v is None:
        return NULL
    # numpy scalars (from pandas) -> native python first
    if type(v).__module__ == "numpy":
        try:
            v = v.item()
        except Exception:
            pass
    try:
        if v != v:  # NaN / NaT
            return NULL
    except Exception:
        pass
    if isinstance(v, float):
        if math.isnan(v):
            return NULL
        if v.is_integer() and abs(v) < 2 ** 53:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    s = str(v)
    return NULL if s == "NaT" else s


def spark_rows(path):
    """(columns, rows-as-string-tuples) from Spark's parquet via pyarrow."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        raise RuntimeError(f"no parquet under {path}")
    cols = None
    rows = []
    for f in files:
        tbl = pq.read_table(f)
        if cols is None:
            cols = list(tbl.column_names)
        elif list(tbl.column_names) != cols:
            # never index a part-file by another file's column order —
            # fail loudly on drift instead of mis-associating values
            raise RuntimeError(
                f"column order drift across part-files: {f} has "
                f"{list(tbl.column_names)}, expected {cols}")
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        data = [tbl.column(i).to_pylist() for i in range(len(cols))]
        for r in range(tbl.num_rows):
            rows.append(tuple(cell(data[i][r]) for i in order))
    return sorted(cols), rows


def duck_rows(con, sql):
    """(columns, rows-as-string-tuples) from DuckDB via pandas (the float
    path a pandas-based harness takes — decimals degrade to float64).

    HUGEINT strictness (round-9 lesson, q114): pandas degrades a HUGEINT
    (int128 — what DuckDB returns for SUM over integers) to float64, and
    cell() would then canonicalize an integral float to the same string as a
    Spark BIGINT, hiding a divergence the driver's hash catches. So we ask
    DuckDB for the DECLARED column types via DESCRIBE and tag HUGEINT /
    UHUGEINT values so they can never equal an int64 — oracles must
    CAST(... AS BIGINT) their integer aggregates (q112's pattern)."""
    declared = {name: typ for name, typ, *_ in
                con.execute("DESCRIBE " + sql).fetchall()}
    df = con.execute(sql).df()
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1)
    huge = [declared.get(c, "").upper() in ("HUGEINT", "UHUGEINT")
            for c in cols]
    rows = [tuple(cell(v) + "::HUGEINT" if h and cell(v) != NULL else cell(v)
                  for v, h in zip(rec, huge))
            for rec in df.itertuples(index=False)]
    return cols, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            s_cols, s_rows = spark_rows(f"{out_dir}/{name}")
            d_cols, d_rows = duck_rows(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        problems = []
        if s_cols != d_cols:
            problems.append(f"columns {s_cols} != {d_cols}")
        elif len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} != {len(d_rows)}")
        else:
            g, w = sorted(s_rows), sorted(d_rows)
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    problems.append(
                        f"value mismatch at sorted row {i}:\n"
                        f"  spark: {dict(zip(s_cols, a))}\n"
                        f"  duck : {dict(zip(d_cols, b))}")
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
