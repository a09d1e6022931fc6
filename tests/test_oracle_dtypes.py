"""Oracle dtype-parity lint + doc-count drift guard.

Round-4 driver postmortem: ``doc_repetition_signals`` failed the driver's
hash check on bit-identical values because its oracle had an uncast integer
``SUM`` — DuckDB types ``SUM(BIGINT)`` as HUGEINT, which pandas
materializes as float64, so the driver canonicalizer hashed ``371.0``
against Spark's ``371``. This lint makes the whole class impossible: every
oracle is executed through ``duckdb .df()`` and its pandas dtypes must
agree in *family* (integral stays integral, floating stays floating) with
the Spark result schema. A floating pandas column is excused only when it
actually carries NULLs (duckdb has no nullable int dtype in .df()).

Also pins the documented registry count in README.md/SURVEY.md to
``len(queries())`` — the count drifted twice during round 4.
"""

from __future__ import annotations

import os
import re

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
FLOATING = {"float", "double"}


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_dtype_parity(spark, ddb, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    stypes = {c.lower(): t for c, t in sdf.dtypes}
    pdf = ddb.execute(ORACLES[name]).df()
    for col in pdf.columns:
        st = stypes[col.lower()]
        dt = pdf[col].dtype
        if st in INTEGRAL:
            if np.issubdtype(dt, np.floating):
                # nullable ints legitimately widen to float64 + NaN; a
                # NaN-free float column means HUGEINT/DECIMAL widening —
                # the oracle needs an explicit CAST(... AS BIGINT)
                assert pdf[col].isna().any(), (
                    f"{name}.{col}: Spark {st} materialized as {dt} with no "
                    f"NULLs — uncast integer aggregate in the oracle SQL"
                )
            else:
                assert np.issubdtype(dt, np.integer) or dt == object, (
                    name, col, st, dt,
                )
        elif st in FLOATING:
            assert not np.issubdtype(dt, np.integer), (
                f"{name}.{col}: Spark {st} but oracle returned integer {dt} — "
                f"add a 1.0e0 * / CAST(... AS DOUBLE) to the oracle"
            )


def _doc_counts() -> list[tuple[str, int]]:
    out = []
    with open(os.path.join(REPO, "README.md")) as f:
        m = re.search(r"\((\d+) entries, ALL with DuckDB", f.read())
        assert m, "README.md registry-count anchor missing"
        out.append(("README.md", int(m.group(1))))
    with open(os.path.join(REPO, "SURVEY.md")) as f:
        ms = re.findall(r"Registry(?: after this session's additions)?: (\d+) entries", f.read())
        assert ms, "SURVEY.md registry-count anchor missing"
        # only the LAST (most recent round note) must match the live count
        out.append(("SURVEY.md", int(ms[-1])))
    return out


def test_registry_count_matches_docs():
    n = len(entrymod.queries())
    for fname, documented in _doc_counts():
        assert documented == n, (
            f"{fname} documents {documented} registry entries but "
            f"len(queries()) == {n} — update the doc"
        )
