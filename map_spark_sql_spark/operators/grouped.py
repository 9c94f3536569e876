"""Grouped Pandas-UDF operators (GROUPED_AGG and applyInPandas).

Completes the Python-execution surface alongside the scalar ``pandas_udf``
encoders (plans/tiles.py), ``mapInPandas`` (operators/multimodal.py) and
``applyInPandasWithState`` (streaming/events.py). These are the escape hatch
for aggregation logic Catalyst can't express; both examples here are chosen
to be SQL-checkable so the DuckDB oracle can pin them (a real use would be a
numpy/scipy computation with no SQL twin).

Scale shape: both shuffle once on the group key — identical to a built-in
groupBy — and the Python work arrives in Arrow batches per group. The risk
at 100 TB is a whale group (one group = one Python worker invocation holding
the whole group in memory); pre-aggregate or salt whale keys first
(operators/skew.py) exactly as for collect_list.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def geomean_by(df: DataFrame, key: str, value: str, out_col: str = "geomean") -> DataFrame:
    """GROUPED_AGG pandas UDF: geometric mean of ``value`` per ``key``
    (exp of mean of logs; positive values only by contract)."""

    @F.pandas_udf("double")
    def _geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    return df.groupBy(key).agg(_geomean(F.col(value)).alias(out_col))


def geomean_by_oracle(table: str, key: str, value: str, out_col: str = "geomean", ndigits: int = 2) -> str:
    return (
        f"SELECT {key}, round(exp(avg(ln({value}))), {ndigits}) AS {out_col} "
        f"FROM {table} GROUP BY {key}"
    )


def zscore_by(
    df: DataFrame, key: str, value: str, id_col: str, out_col: str = "z", ndigits: int = 4
) -> DataFrame:
    """applyInPandas (grouped map): within-group z-score of ``value``
    (sample stddev), emitted per input row. 1-row groups emit z = NULL, like
    SQL's stddev_samp."""
    schema = f"{id_col} long, {key} string, {out_col} double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value].astype("float64")
        sd = v.std(ddof=1)
        z = (v - v.mean()) / sd if sd and not math.isnan(sd) and sd > 0 else v * float("nan")
        return pd.DataFrame(
            {id_col: pdf[id_col], key: pdf[key], out_col: z.round(ndigits)}
        )

    return df.select(id_col, key, value).groupBy(key).applyInPandas(norm, schema=schema)


def zscore_by_oracle(
    table: str, key: str, value: str, id_col: str, out_col: str = "z", ndigits: int = 4
) -> str:
    return f"""
SELECT {id_col}, {key},
       round(({value} - avg({value}) OVER (PARTITION BY {key}))
             / stddev_samp({value}) OVER (PARTITION BY {key}), {ndigits}) AS {out_col}
FROM {table}
"""
