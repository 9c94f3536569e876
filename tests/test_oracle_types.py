"""Oracle output-type lint.

The driver hashes values type-sensitively: a DuckDB HUGEINT column (an
uncast ``sum(BIGINT)``, or ``BIGINT // HUGEINT`` division) hash-mismatches
Spark's LONG even when every value is identical.  Round 5's only two red
driver cells (``events_transition_matrix``, ``text_bpe_pair_merges``) were
exactly this class, so this test binds every registered oracle against the
sf0.001 views (bind only — no execution) and asserts no output column is
HUGEINT/UHUGEINT.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_oracle_emits_hugeint(con):
    import __spark_entry__ as entrymod

    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)  # binds (types resolved) without executing
        huge = [
            c
            for c, t in zip([d[0] for d in rel.description], rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if huge:
            offenders[name] = huge
    assert not offenders, (
        f"oracles with HUGEINT output columns (CAST to BIGINT): {offenders}"
    )
