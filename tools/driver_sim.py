"""Simulate the DRIVER's correctness compare as faithfully as its
observed failure modes allow (CORRECTNESS_r01 tracebacks): Spark result
→ toPandas, DuckDB oracle → df(), both canonicalized with
``pandas.DataFrame.sort_values`` over name-sorted columns (this is what
crashes on ndarray cells), then compared as row-count + column names +
rounded-value frames.

Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # the driver's sort (pandas lexsort via Categorical) — crashes on
    # unhashable cells, which is exactly what we want to detect
    pdf = pdf.sort_values(cols).reset_index(drop=True)
    for c in cols:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: round(v, 6) if isinstance(v, float)
                and not math.isnan(v) else v)
    return pdf


def _dtype_class(col: pd.Series) -> str:
    """Coarse class tag the driver's value-hash is sensitive to: a
    Decimal object column stringifies with trailing zeros
    ('1709139.2670') while float64 does not ('1709139.267'), so the
    same numeric value hashes differently (r10 q_nation_profit)."""
    import decimal
    if col.dtype.kind == "f":
        return "float"
    if col.dtype == object:
        # one non-None value decides the class — don't scan the column
        for v in col:
            if v is None:
                continue
            if isinstance(v, decimal.Decimal):
                return "decimal"
            if isinstance(v, float):
                return "float"
            return "object"
    return col.dtype.kind


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        ca, cb = _dtype_class(a[c]), _dtype_class(b[c])
        if {ca, cb} == {"decimal", "float"}:
            # numeric values may match but the driver hashes the
            # string forms, which differ → hard fail
            return False
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            if not np.allclose(av.astype("float64"), bv.astype("float64"),
                               rtol=0, atol=1e-6, equal_nan=True):
                return False
        else:
            am = pd.isna(av)
            bm = pd.isna(bv)
            if not (am == bm).all():
                return False
            if not (av[~am].astype(str) == bv[~bm].astype(str)).all():
                return False
    return True


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from graphraft_spark.session import get_spark

    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            ddf = con.execute(oracles[name]).df()
            sc, dc = canon(spdf), canon(ddf)
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        dtypes_differ = [
            c for c in sc.columns
            if c in dc.columns and str(sc[c].dtype) != str(dc[c].dtype)]
        ok = frames_equal(sc, dc)
        mark = "PASS" if ok else "FAIL"
        note = f" [dtype diff: {dtypes_differ}]" if dtypes_differ else ""
        print(f"{mark} {name}: {len(sc)} rows "
              f"({time.time() - t0:.1f}s){note}")
        if not ok:
            failed.append(name)

    print(f"\n{len(qs) - len(failed)}/{len(qs)} passed")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
