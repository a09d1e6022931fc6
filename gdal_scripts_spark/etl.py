"""S5 — vector ETL with declarative schema mapping (ogr2ogr layer copy).

Reference semantics: ``apps/ogr2ogr_lib.cpp : GDALVectorTranslate /
SetupTargetLayer (≈L3500)`` builds a source→target FIELD MAP (by name, with
declared target types), and ``ogr/ogrfeature.cpp : OGRFeature::SetFrom
(≈L5000)`` applies it per feature with type coercion; ``-select`` prunes,
``-where`` filters, ``-nln/-sql`` rename/derive. The reference walks
features one at a time; here the same contract is one declarative
``select`` Catalyst plans (column pruning + predicate pushdown reach the
Parquet scan for free).

The mapping is data, not code, so pipelines can store/inspect it:

    spec = [("dst_name", "src_name_or_expr", "type" | None), ...]

- src may be a bare column name or any SQL expression (``-sql`` analog);
- type None keeps the source type; otherwise ``CAST`` (OGR coercion analog);
- a dst with src=None becomes a typed NULL column (target field with no
  source — exactly what SetFrom does for unmatched fields).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


FieldSpec = tuple[str, str | None, str | None]


def translate_layer(
    src: DataFrame,
    fields: list[FieldSpec],
    where: str | None = None,
) -> DataFrame:
    """ogr2ogr layer copy: WHERE filter + declared field map (see module
    docstring). Returns the mapped DataFrame; write it with
    ``df.write.format("iceberg"/"parquet")`` — the sink is native."""
    out = src.filter(where) if where else src
    cols = []
    for dst, srcexpr, typ in fields:
        if srcexpr is None:
            if typ is None:
                raise ValueError(f"field {dst!r}: src-less field needs a type")
            col = F.lit(None).cast(typ)
        else:
            col = F.expr(srcexpr)
            if typ is not None:
                col = col.cast(typ)
        cols.append(col.alias(dst))
    return out.select(*cols)


def copy_layer(
    src: DataFrame,
    dst_path: str,
    fields: list[FieldSpec],
    where: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Full ogr2ogr analog: map + write in one call (``-f``/``-nln``)."""
    out = translate_layer(src, fields, where)
    w = out.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(dst_path)
