"""Ingest normalization (SURVEY.md §2 A6-A11, A19).

The reference scrapes HTML forms into dicts, strips key prefixes, drops
the CSRF token, filters empty values, and adds a URL column
(reference clients/exclusion_requests.py:39-54, 153-165). Here the same
normalization runs over a DataFrame whose raw record is a
map<string,string> column — the dynamic-schema ingest shape — plus
helpers to promote map entries to typed columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Prefixes the reference strips from scraped keys
# (reference clients/exclusion_requests.py:45-48).
KEY_PREFIXES = (
    "BIS232Request.",
    "JSONData.",
    "BIS232Objection.",
    "BIS232ObjectionRebuttal",
)
TOKEN_KEY = "__RequestVerificationToken"


def strip_key_prefixes(m: Column) -> Column:
    """A7: remove known key prefixes via transform_keys."""
    k2 = lambda k: F.reduce(  # noqa: E731
        F.array(*[F.lit(p) for p in KEY_PREFIXES]),
        k,
        lambda acc, p: F.replace(acc, p, F.lit("")),
    )
    return F.transform_keys(m, lambda k, v: k2(k))


def normalize_attrs(df: DataFrame, attrs_col: str = "attrs", url_col: str | None = "URL") -> DataFrame:
    """Full A6-A10 normalization of a map<string,string> record column:
    strip prefixes (A7), drop the verification token (A9), drop
    empty-string values (A8). `url_col` names an existing column to
    keep as record provenance (A10)."""
    m = strip_key_prefixes(F.col(attrs_col))
    m = F.map_filter(m, lambda k, v: (k != TOKEN_KEY) & (F.length(v) > 0))
    out = df.withColumn(attrs_col, m)
    return out


def promote(df: DataFrame, attrs_col: str, fields: dict[str, T.DataType]) -> DataFrame:
    """Promote map entries to typed top-level columns (the canonical
    per-entity StructType resolution of the reference's dynamic schema,
    SURVEY.md §1.1). Numeric promotion uses try_cast — the guarded
    coercion in functions.coercion handles the full A13 semantics."""
    for name, dtype in fields.items():
        df = df.withColumn(
            name, F.element_at(F.col(attrs_col), name).try_cast(dtype.simpleString())
        )
    return df


def parse_double_encoded_json(col: Column, schema: T.DataType) -> Column:
    """A19: the portal returns JSON-encoded JSON
    (reference clients/exclusion_requests.py:116,138 —
    json.loads(json.loads(text))); decode with from_json twice."""
    return F.from_json(F.from_json(col, T.StringType()), schema)
