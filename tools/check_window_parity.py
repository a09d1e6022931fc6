#!/usr/bin/env python
"""Driver-faithful oracle-parity check for the front of the verification
window: runs each entry's Spark query AND its DuckDB oracle at sf0.01,
compares row count, sorted column-name schema, and a canonical value hash
(columns sorted by name, rows sorted, floats rounded) — the same contract
CORRECTNESS_r{N}.json grades. Also asserts dtype integrality parity (the
round-4 `doc_repetition_signals` failure class: DuckDB HUGEINT -> pandas
float64 vs Spark bigint).

Usage: python tools/check_window_parity.py [n_entries=13] [sf_dir]
"""
from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from gdal_scripts_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            s = s.astype(str)
        elif np.issubdtype(s.dtype, np.floating):
            s = s.round(6)
        out.append(s)
    d = pd.concat(out, axis=1)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    return hashlib.md5(d.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    qs, osql = entry.queries(), entry.oracle_sql()
    # queries() is built in _ordered_names() order (least-verified first),
    # which IS the driver's verification-window order
    names = list(qs)[:n]
    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf}/{t}.parquet'")
    bad = 0
    for name in names:
        if name not in osql:
            print(f"{name}: NO ORACLE (rows-only driver check)")
            continue
        try:
            sdf = qs[name](spark, sf).toPandas()
            odf = con.execute(osql[name]).df()
            rows = len(sdf) == len(odf)
            schema = sorted(sdf.columns) == sorted(odf.columns)
            hmatch = canon(sdf) == canon(odf) if rows and schema else False
            dtype_ok = all(
                np.issubdtype(sdf[c].dtype, np.integer)
                == np.issubdtype(odf[c].dtype, np.integer)
                for c in sdf.columns if c in odf.columns
            )
            ok = rows and schema and hmatch and dtype_ok
            bad += 0 if ok else 1
            print(json.dumps({"name": name, "rows": rows, "schema": schema,
                              "hash": hmatch, "dtype_parity": dtype_ok,
                              "n": len(sdf)}))
        except Exception as ex:  # pragma: no cover - diagnostic tool
            bad += 1
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
    spark.stop()
    print(f"checked {len(names)}: {'ALL GREEN' if bad == 0 else f'{bad} BAD'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
