"""Tokenization as Spark column expressions.

Two tiers:

* ``tokens_col`` — pure JVM expression (``lower`` → ``split`` on the
  reference's delimiter class → drop empties).  Stays inside
  whole-stage codegen; exactly equal to ``core.textproc.tokenize`` for
  ASCII input (the reference corpus is ascii-ignore decoded anyway,
  file_tools.py:41-51).
* ``tokenize_udf`` — Arrow-vectorized pandas UDF delegating to
  ``core.textproc.tokenize`` for byte-exact parity on arbitrary
  unicode (strip() of exotic unicode whitespace at token edges).

Use the JVM tier in hot paths; the UDF tier where the parity fixture
demands byte equality on non-ASCII input.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.textproc import TOKEN_SPLIT_CHARCLASS, tokenize

# `split` drops nothing by itself; filter the empty strings after.
_SPLIT_PATTERN = TOKEN_SPLIT_CHARCLASS


def tokens_col(col: Column | str, lowercase: bool = True) -> Column:
    """array<string> of reference-semantics tokens (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, _SPLIT_PATTERN), lambda t: t != "")


# SQL text of the same expression, for spark.sql callers.  SPARK SQL
# ONLY: the double-escaping below matches Spark's SQL string-literal
# parser (escapedStringLiterals=false); a DuckDB literal needs the raw
# pattern instead (the oracle strings in __spark_entry__ carry their
# own).  Round-trip equality with tokens_col is pinned by
# tests/test_textproc.py::test_tokens_sql_roundtrip.
def tokens_sql(expr: str, lowercase: bool = True) -> str:
    inner = f"lower({expr})" if lowercase else expr
    # Spark's SQL string-literal parser unescapes backslash sequences
    # (spark.sql.parser.escapedStringLiterals=false by default), so the
    # regex must be double-escaped to reach split() intact — embedding
    # _SPLIT_PATTERN raw would silently turn '\\s' into the letter 's'
    # and corrupt every token boundary.
    pat = _SPLIT_PATTERN.replace("\\", "\\\\")
    return f"filter(split({inner}, '{pat}'), t -> t <> '')"


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Byte-exact tokenizer (core.textproc.tokenize on lowercased text)."""
    return texts.map(lambda t: tokenize(t.lower()) if t is not None else [])
