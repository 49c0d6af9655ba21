"""Text normalization — vectorized Arrow/pandas UDFs only (the
input_hint's "no per-row Python" rule).

Each normalizer is a Series->Series pandas UDF operating on Arrow
batches; the pandas .str accessors are vectorized C paths. The plain
``normalize_text_expr`` builtin-function variant is provided too and is
preferred in hot paths (JVM codegen beats Arrow transfer when the logic
fits builtins — UDFs exist for logic that doesn't, e.g. unicode
category folding).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def normalize_whitespace(s: pd.Series) -> pd.Series:
    """Collapse runs of whitespace, strip ends."""
    return s.str.replace(r"\s+", " ", regex=True).str.strip()


@F.pandas_udf(T.StringType())
def normalize_casefold(s: pd.Series) -> pd.Series:
    """Full unicode casefold (stronger than lower(); not expressible
    with builtins)."""
    return s.str.casefold()


@F.pandas_udf(T.StringType())
def strip_control_chars(s: pd.Series) -> pd.Series:
    return s.str.replace(r"[\x00-\x1f\x7f]", "", regex=True)


@F.pandas_udf(T.IntegerType())
def utf8_byte_len(s: pd.Series) -> pd.Series:
    return s.str.encode("utf-8").str.len().astype("int32")


def normalize_text_expr(col: str | Column) -> Column:
    """Builtin-only normalization (JVM codegen, zero Python): trim +
    whitespace collapse + lower. Prefer this in hot paths."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
