"""Guarded dynamic type coercion (SURVEY.md §1.2 / A13).

Replicates the reference's `typify_value` semantics
(reference clients/dynamodb.py:51-72) as Catalyst expressions:

1. Guard: a string is never treated as numeric if (case-insensitively)
   it contains the letter 'e' or the substrings 'inf'/'nan' — the
   reference's defense against `float('1E1771') == inf`. Side effect
   preserved: legitimate scientific notation stays a string.
2. Int before float: "7304191080" → long, "0.25" → double.
3. Whitespace-tolerant int parse (" 12 " → 12), like Python int().
4. Anything unparseable stays a string; NULL input → 'null' tag.
   (The reference's bool→NULL quirk applies to Python bool *objects*;
   on a string column there are no bool objects — `typify_pandas`
   covers arbitrary-object inputs and reproduces it.)

Spark 4 runs ANSI mode, so all parses use try_* semantics gated by
explicit regexes — a bare cast would either raise or accept
scientific notation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Case-insensitive guard: any 'e', 'inf', or 'nan' anywhere blocks
# numeric interpretation (reference clients/dynamodb.py:53-54).
GUARD_RE = r"(?i)(e|inf|nan)"
INT_RE = r"^[+-]?[0-9]+$"
# No exponent branch needed: the guard already excludes every 'e'.
FLOAT_RE = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)$"


def typify_tag(raw: Column) -> Column:
    """Type tag ∈ {'long','double','string','null'} per the reference rules."""
    t = F.trim(raw)
    return (
        F.when(raw.isNull(), F.lit("null"))
        .when(raw.rlike(GUARD_RE), F.lit("string"))
        .when(t.rlike(INT_RE) & t.try_cast("long").isNotNull(), F.lit("long"))
        .when(t.rlike(FLOAT_RE) & t.try_cast("double").isNotNull(), F.lit("double"))
        .otherwise(F.lit("string"))
    )


def typify_long(raw: Column) -> Column:
    return F.when(typify_tag(raw) == "long", F.trim(raw).try_cast("long"))


def typify_double(raw: Column) -> Column:
    return F.when(typify_tag(raw) == "double", F.trim(raw).try_cast("double"))


def decimal_re(scale: int) -> str:
    """Regex admitting plain decimal strings with AT MOST ``scale``
    fractional digits — the exactness gate for typify_decimal (an
    over-scale string must stay a string, never be silently rounded,
    and Spark/DuckDB round differently so rounding would also break
    oracle equality)."""
    if scale < 0:
        raise ValueError(f"decimal scale must be >= 0, got {scale}")
    if scale == 0:
        # whole-unit currencies (JPY, KRW): integer strings, with the
        # trailing-dot form ("5.") admitted for consistency with every
        # scale>=1 pattern (whose {0,scale} quantifier accepts zero
        # fraction digits after the dot) — the generic template would
        # emit the invalid quantifier {1,0}
        return r"^[+-]?[0-9]+\.?$"
    return rf"^[+-]?([0-9]+(\.[0-9]{{0,{scale}}})?|\.[0-9]{{1,{scale}}})$"


def typify_decimal(raw: Column, precision: int = 18, scale: int = 4) -> Column:
    """Money-exact numeric coercion: DynamoDB's `N` is an
    ARBITRARY-PRECISION decimal (reference clients/dynamodb.py:51-72
    serializes numbers as strings), so the money path must not round
    through binary doubles. Same guard semantics as typify_tag (no
    e/inf/nan anywhere, whitespace-tolerant), value lands in
    DECIMAL(precision, scale). Exactness contract: a string with more
    fractional digits than ``scale`` (or too many integer digits for
    ``precision``) is NOT silently rounded — it fails the gate and
    coerces to NULL, exactly like any other unparseable string."""
    t = F.trim(raw)
    return F.when(
        raw.isNotNull()
        & ~raw.rlike(GUARD_RE)
        & t.rlike(decimal_re(scale)),
        t.try_cast(f"decimal({precision},{scale})"),
    )


def typify(raw: Column) -> Column:
    """Full coercion as a struct(tag, long_val, double_val, str_val)."""
    return F.struct(
        typify_tag(raw).alias("tag"),
        typify_long(raw).alias("long_val"),
        typify_double(raw).alias("double_val"),
        F.when(typify_tag(raw) == "string", raw).alias("str_val"),
    )


def oracle_case_sql(raw: str) -> str:
    """The same tag logic as ANSI SQL (DuckDB) over expression `raw` —
    used by the oracle side of the differential test."""
    return f"""
    CASE
      WHEN ({raw}) IS NULL THEN 'null'
      WHEN regexp_matches(({raw}), '(?i)(e|inf|nan)') THEN 'string'
      WHEN regexp_matches(trim({raw}), '^[+-]?[0-9]+$')
           AND try_cast(trim({raw}) AS BIGINT) IS NOT NULL THEN 'long'
      WHEN regexp_matches(trim({raw}), '^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)$')
           AND try_cast(trim({raw}) AS DOUBLE) IS NOT NULL THEN 'double'
      ELSE 'string'
    END
    """


def typify_tag_pandas():
    """Arrow-batched UDF variant handling arbitrary Python objects —
    including the reference's bool→NULL fall-through
    (reference clients/dynamodb.py:72: dispatch matches dict/list/str/
    int/float exactly; bool is none of them). Returned lazily because
    pandas_udf creation needs an active SparkSession."""

    import re

    int_re = re.compile(INT_RE)
    float_re = re.compile(FLOAT_RE)

    def one(v: object) -> str | None:
        if v is None:
            return "null"
        if isinstance(v, bool):  # bool before int: type-exact dispatch
            return "null"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "double"
        s = str(v)
        low = s.lower()
        if "e" in low or "inf" in low or "nan" in low:
            return "string"
        # Same regex gate as the Catalyst expression (typify_tag), NOT a
        # bare int()/float(): Python parses accept underscores
        # ("1_000") and non-ASCII digits, which the engine rejects as
        # strings — a documented, deliberate tightening of the
        # reference semantics. Trim matches F.trim (spaces only).
        t = s.strip(" ")
        if int_re.fullmatch(t) and -(2**63) <= int(t) < 2**63:
            return "long"
        if float_re.fullmatch(t):
            return "double"
        return "string"

    @pandas_udf("string")
    def _udf(raw: pd.Series) -> pd.Series:
        return raw.map(one)

    return _udf


def typify_array(raw_array: Column) -> Column:
    """The reference's heterogeneous-list normalization (A13 `L` type,
    reference clients/dynamodb.py:66-67: list elements are recursively
    typed and may mix types). Spark arrays are homogeneous, so the
    lossless shape is an array of the typify variant struct — each
    element carries its own (tag, long_val, double_val, str_val)
    (SURVEY.md §7 'heterogeneous lists' risk item)."""
    return F.transform(raw_array, typify)
