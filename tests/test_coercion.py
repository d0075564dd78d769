"""Property-based tests for the guarded coercion (SURVEY.md §1.2/§5.3):
the Catalyst expression (typify_tag) and the Arrow UDF (typify_tag_pandas)
must agree with the reference semantics of typify_value
(reference clients/dynamodb.py:51-72) on arbitrary strings/objects."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stupp_exclusion_etl_spark.functions.coercion import typify, typify_tag_pandas


def reference_tag(s: str | None) -> str:
    """Pure-python restatement of the reference rules for string input
    (reference clients/dynamodb.py:51-72: guard, then int(), then
    float())."""
    if s is None:
        return "null"
    low = s.lower()
    if "e" in low or "inf" in low or "nan" in low:
        return "string"
    try:
        int(s)
        return "long"
    except ValueError:
        pass
    try:
        float(s)
        return "double"
    except ValueError:
        return "string"


def plain(s: str) -> bool:
    """Strings where the engine's regex gate and Python's parser agree.
    Excluded (documented deviations, functions/coercion.py): underscore
    digit grouping, non-ASCII digits, non-space whitespace padding —
    Python accepts all three; the engine keeps them as strings."""
    return s.isascii() and "_" not in s and not any(c in s for c in "\t\n\r\v\f")


INTERESTING = [
    "1E1771", "1e5", "inf", "-inf", "nan", "NaN", "Infinity", "True", "False",
    " 12 ", "+7", "-0.25", ".5", "5.", "7304191080", "12 34", "", " ", "0x1f",
    "1_000", "١٢٣", "𝟙𝟚", "=1", "nine",
]


def _spark_tags(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    return [r.t.tag for r in df.select(typify(F.col("raw")).alias("t")).collect()]


def test_interesting_strings_match_reference(spark):
    got = _spark_tags(spark, INTERESTING)
    for v, g in zip(INTERESTING, got):
        if plain(v):
            assert g == reference_tag(v), (v, g)
    # documented deviations stay strings rather than silently parsing
    assert got[INTERESTING.index("1_000")] == "string"
    assert got[INTERESTING.index("١٢٣")] == "string"


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(max_size=12), min_size=1, max_size=40))
def test_arbitrary_strings_match_reference(spark, values):
    # Python int()/float() accept exotic unicode digits / underscores /
    # non-space whitespace that the Catalyst regex gate intentionally
    # rejects (stays 'string'); exclude only those from the equivalence
    # claim, never from the crash check.
    got = _spark_tags(spark, values)
    for v, g in zip(values, got):
        assert g in {"long", "double", "string", "null"}
        if plain(v):
            assert g == reference_tag(v), repr(v)


def test_values_roundtrip(spark):
    vals = ["42", " 12 ", "-0.25", "0.25", "1E1771", "hello", None]
    df = spark.createDataFrame([(v,) for v in vals], "raw string")
    rows = df.select("raw", typify(F.col("raw")).alias("t")).collect()
    for r in rows:
        t = r.t
        if t.tag == "long":
            assert t.long_val == int(r.raw)
        elif t.tag == "double":
            assert t.double_val == float(r.raw)
        elif t.tag == "string":
            assert t.str_val == r.raw
        else:
            assert r.raw is None


def test_pandas_udf_bool_to_null(spark):
    """The reference's type-exact dispatch sends Python bools to NULL
    (str(True) contains 'e' → guard; bool is not int/float to the
    dispatch) — reproduced by the Arrow variant on an object column."""
    df = spark.createDataFrame(
        [(True,), (False,), (None,)], "raw boolean"
    )
    tag = typify_tag_pandas()
    got = [r.tag for r in df.select(tag(F.col("raw")).alias("tag")).collect()]
    assert got == ["null", "null", "null"]


def test_pandas_udf_matches_expression_on_strings(spark):
    df = spark.createDataFrame([(v,) for v in INTERESTING], "raw string")
    tag = typify_tag_pandas()
    both = df.select(
        typify(F.col("raw")).alias("t"), tag(F.col("raw")).alias("u")
    ).collect()
    assert [r.t.tag for r in both] == [r.u for r in both]


def test_typify_array_heterogeneous(spark):
    """A13 `L`: a scraped list mixing ints, floats, strings and
    pathologies normalizes to a variant-struct array, element-wise."""
    from stupp_exclusion_etl_spark.functions.coercion import typify_array

    df = spark.createDataFrame(
        [(["42", "0.25", "hello", "1E1771", None],)], "raw array<string>"
    )
    (row,) = df.select(typify_array(F.col("raw")).alias("t")).collect()
    tags = [e.tag for e in row.t]
    assert tags == ["long", "double", "string", "string", "null"]
    assert row.t[0].long_val == 42
    assert row.t[1].double_val == 0.25
    assert row.t[3].str_val == "1E1771"


def test_typify_decimal_exactness_contract(spark):
    """Money coercion (r11): guard semantics shared with typify_tag,
    value exact in DECIMAL(p,s), and OVER-scale strings coerce to
    NULL instead of rounding (Spark HALF_UP vs DuckDB HALF_EVEN would
    silently diverge)."""
    from decimal import Decimal

    from stupp_exclusion_etl_spark.functions.coercion import typify_decimal

    rows = [
        ("12.50",), (" 12.50 ",), ("0.0001",), ("-3.14",), ("7",),
        ("12.34567",),      # over-scale: NULL, never rounded
        ("1E5",), ("inf",), ("nan",), ("abc",), ("",), (None,),
        ("99999999999999.9999",),   # 18 digits: fits DECIMAL(18,4)
        ("999999999999999.9999",),  # 19 digits: overflows -> NULL
    ]
    df = spark.createDataFrame(rows, "s string").select(
        typify_decimal(F.col("s")).alias("d")
    )
    got = [r.d for r in df.collect()]
    exp = [
        Decimal("12.5000"), Decimal("12.5000"), Decimal("0.0001"),
        Decimal("-3.1400"), Decimal("7.0000"),
        None, None, None, None, None, None, None,
        Decimal("99999999999999.9999"), None,
    ]
    assert got == exp
    # scale gate follows the requested scale
    df2 = spark.createDataFrame([("1.234",), ("1.23",)], "s string").select(
        typify_decimal(F.col("s"), 12, 2).alias("d")
    )
    assert [r.d for r in df2.collect()] == [None, Decimal("1.23")]


def test_typify_decimal_scale_zero(spark):
    """Scale-0 decimals (whole-unit currencies like JPY): the generic
    regex template would emit the invalid quantifier {1,0} (r11 ADVICE);
    the scale-0 branch admits integer strings plus the trailing-dot
    form '5.' — the same boundary every scale>=1 pattern draws via its
    {0,scale} quantifier (r12 ADVICE: a consistent over-scale contract
    across scales). Any fractional DIGIT, even '.0', still fails the
    exactness gate."""
    from decimal import Decimal

    import pytest

    from stupp_exclusion_etl_spark.functions.coercion import (
        decimal_re,
        typify_decimal,
    )

    assert decimal_re(0) == r"^[+-]?[0-9]+\.?$"
    with pytest.raises(ValueError):
        decimal_re(-1)
    rows = [("1200",), (" -45 ",), ("+7",), ("5.",), ("12.0",),
            ("12.5",), ("1E3",), ("abc",), (".",), (None,)]
    df = spark.createDataFrame(rows, "s string").select(
        typify_decimal(F.col("s"), 12, 0).alias("d")
    )
    got = [r.d for r in df.collect()]
    assert got == [Decimal("1200"), Decimal("-45"), Decimal("7"),
                   Decimal("5"), None, None, None, None, None, None]
