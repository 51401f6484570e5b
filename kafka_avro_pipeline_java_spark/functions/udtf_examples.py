"""User-defined function surface examples (SURVEY.md §2B UDF/UDAF/UDTF row).

The engine's stance: built-ins first (see functions/ — everything hot is
JVM-side). These examples document the THREE extension points for the
cases built-ins can't express, each in its scale-appropriate form:

- scalar:    ``pandas_udf`` (Arrow-vectorized, not row-at-a-time)
- aggregate: ``applyInPandas`` grouped aggregation
- table:     Python UDTF (one row in → many rows out, lateral-join shape)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def squared_relu(v: pd.Series) -> pd.Series:
    """Vectorized scalar example: max(x,0)^2 over Arrow batches."""
    clipped = v.clip(lower=0.0)
    return clipped * clipped


def grouped_median(df, key_col: str, value_col: str):
    """Grouped-aggregate example via applyInPandas (a UDAF shape: per-group
    pandas computation with map-side Arrow batching). The key column keeps
    its input type (string group keys work as well as longs)."""

    key_type = df.schema[key_col].dataType.simpleString()

    def med(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key_col: [pdf[key_col].iloc[0]],
                             "median_value": [float(pdf[value_col].median())]})

    return df.groupBy(key_col).applyInPandas(
        med, schema=f"{key_col} {key_type}, median_value double"
    )


@udtf(returnType="ngram: string, position: int")
class NGramExpander:
    """Table function: explode text into character n-grams with positions
    (one input row → many output rows; the LATERAL JOIN shape)."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None:
            return
        for i in range(max(0, len(text) - n + 1)):
            yield text[i : i + n], i
