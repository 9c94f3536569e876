"""Map-view keys and salted sink keys.

Reimplements, as native Column expressions, the semantics of:

- ``udf/MapKeysUDF.java:36-147`` (U1) — a record fans out to one
  ``"{typeId}:{value}"`` key per non-null map dimension, plus the constant
  ``"0:0"`` (ALL) key; keys are **set**-valued (HashSet in the reference, so
  duplicates collapse — e.g. ``genusKey == taxonKey`` emits one TAXON key);
  an optional approve/deny set filters the result
  (``MapKeysUDF.java:134-144``).
- ``udf/HBaseKeyUDF.java:28-60`` (U5) — keys are prefixed with a fixed-width
  salt ``abs(hash(key)) % modulus`` + ``":"`` so the sink shuffle aligns with
  pre-split HBase regions (``workflow/PrepareBackfill.java:49-51``).

Hash convention: the reference salts with Java ``String.hashCode``-based
ModulusSalt (external lib). Exact Java parity is a non-goal (SURVEY.md §2.6
U5); our documented convention is **the first 8 hex digits of md5(key) read as
a big-endian integer**, which is deterministic, uniform, and — crucially for
the correctness harness — expressible identically in Spark SQL and DuckDB.

Every factory here has a ``*_sql`` twin that emits the equivalent DuckDB SQL
from the same constants, so oracle queries are generated, not hand-kept.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Backwards-compatible map type ids (MapKeysUDF.java:68-79).
MAP_TYPES = {
    "ALL": 0,
    "TAXON": 1,
    "DATASET": 2,
    "PUBLISHER": 3,
    "COUNTRY": 4,
    "PUBLISHING_COUNTRY": 5,
    "NETWORK": 6,
}

# ---------------------------------------------------------------------------
# stable hash + salt (U5)
# ---------------------------------------------------------------------------


def stable_hash(key: Column) -> Column:
    """Deterministic 32-bit-range hash of a string: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")


def stable_hash_sql(key_sql: str, dialect: str = "duckdb") -> str:
    """SQL-text twin of :func:`stable_hash` (md5 agrees across engines; only
    the hex->int idiom differs per dialect)."""
    if dialect == "spark":
        return f"CAST(conv(substring(md5({key_sql}), 1, 8), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr(md5({key_sql}), 1, 8) AS BIGINT)"


def salt_of(key: Column, modulus: int) -> Column:
    """Fixed-width zero-padded salt string, e.g. modulus 100 -> '07'."""
    width = len(str(modulus - 1))
    return F.lpad(F.pmod(stable_hash(key), F.lit(modulus)).cast("string"), width, "0")


def salt_of_sql(key_sql: str, modulus: int) -> str:
    width = len(str(modulus - 1))
    return f"lpad(CAST({stable_hash_sql(key_sql)} % {modulus} AS VARCHAR), {width}, '0')"


def salted_key(*parts: Column | str, modulus: int) -> Column:
    """Salted sink key: ``"{salt}:{p1}:{p2}:..."``.

    Tile variant (``HBaseKeyUDF.java:43-50``): parts = (mapKey, z, x, y);
    point variant (``HBaseKeyUDF.java:54-60``): parts = (mapKey,).
    """
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    key = F.concat_ws(":", *[c.cast("string") for c in cols])
    return F.concat(salt_of(key, modulus), F.lit(":"), key)


def salted_key_sql(*part_sqls: str, modulus: int) -> str:
    key = " || ':' || ".join(f"CAST({p} AS VARCHAR)" for p in part_sqls)
    return f"({salt_of_sql('(' + key + ')', modulus)} || ':' || {key})"


# ---------------------------------------------------------------------------
# map keys (U1)
# ---------------------------------------------------------------------------


def map_keys(
    dims: Sequence[tuple[str | int, Column]],
    network: Column | None = None,
    approve: Sequence[str] | None = None,
    deny: Sequence[str] | None = None,
) -> Column:
    """Array of ``"{typeId}:{value}"`` view keys for one record.

    ``dims`` is a list of (map type, column) pairs; the type may be a name from
    :data:`MAP_TYPES` or an explicit int id. Null dimensions are skipped
    (``MapKeysUDF.java:149-151``), the constant ``"0:0"`` ALL key is always
    emitted (``MapKeysUDF.java:115``), and the result is distinct
    (HashSet semantics, ``MapKeysUDF.java:114``). ``network`` is an optional
    ``array<string>`` column fanned out under the NETWORK type id
    (``MapKeysUDF.java:128-132``).

    ``approve``/``deny`` implement the in-expression set filter of
    ``MapKeysUDF.java:134-144``; for large sets prefer a real broadcast
    semi/anti join on the exploded keys (see plans/pipeline.py, J1/J2).
    """
    parts = [F.lit("0:0")]
    for typ, col in dims:
        tid = MAP_TYPES[typ] if isinstance(typ, str) else typ
        parts.append(F.when(col.isNotNull(), F.concat(F.lit(f"{tid}:"), col.cast("string"))))
    arr = F.array_distinct(F.array_compact(F.array(*parts)))
    if network is not None:
        tid = MAP_TYPES["NETWORK"]
        net = F.transform(
            F.filter(F.coalesce(network, F.array()), lambda n: n.isNotNull()),
            lambda n: F.concat(F.lit(f"{tid}:"), n),
        )
        arr = F.array_union(arr, net)
    if approve:
        arr = F.array_intersect(arr, F.array(*[F.lit(k) for k in approve]))
    if deny:
        arr = F.array_except(arr, F.array(*[F.lit(k) for k in deny]))
    return arr


def map_keys_sql(
    dims: Sequence[tuple[str | int, str]],
    network_sql: str | None = None,
    approve: Sequence[str] | None = None,
    deny: Sequence[str] | None = None,
) -> str:
    """DuckDB twin of :func:`map_keys` (list order may differ; sort before
    comparing, or explode + aggregate as the pipeline does)."""
    items = ["'0:0'"]
    for typ, col_sql in dims:
        tid = MAP_TYPES[typ] if isinstance(typ, str) else typ
        items.append(f"CASE WHEN {col_sql} IS NOT NULL THEN '{tid}:' || CAST({col_sql} AS VARCHAR) END")
    arr = f"list_distinct(list_filter([{', '.join(items)}], x -> x IS NOT NULL))"
    if network_sql is not None:
        tid = MAP_TYPES["NETWORK"]
        net = (
            f"list_transform(list_filter(coalesce({network_sql}, []), n -> n IS NOT NULL),"
            f" n -> '{tid}:' || n)"
        )
        arr = f"list_distinct(list_concat({arr}, {net}))"
    if approve:
        lits = ", ".join(f"'{k}'" for k in approve)
        arr = f"list_filter({arr}, x -> list_contains([{lits}], x))"
    if deny:
        lits = ", ".join(f"'{k}'" for k in deny)
        arr = f"list_filter({arr}, x -> NOT list_contains([{lits}], x))"
    return arr
