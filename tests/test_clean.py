"""Unit tests for the standardize kernel (SURVEY §5: the three date formats,
regex-gate -> NULL -> quarantine, 'Not Provided' defaulting, literal-map
lookup)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from bankcreditunion_datapipeline_spark.operators.clean import (
    ColumnSpec,
    StandardizeSpec,
    apply_with_quarantine,
    null_or_empty_counts,
    select_sort_dated_cols,
    standardize,
)

# The reference's three source date formats (SURVEY §1.2):
FDIC_INST = (r"\d{1,2}/\d{1,2}/\d{4}", "M/d/yyyy")  # BuildSilverLayer.py:156-157
FDIC_FIN = (r"\d{8}", "yyyyMMdd")  # BuildSilverLayer.py:184-185
NCUA = (r"\d{1,2}/\d{1,2}/\d{4} 0:00:00", "M/dd/yyyy H:mm:ss")  # :214-215


def test_three_date_formats_parse(spark):
    rows = [("3/31/2020", "20200331", "3/31/2020 0:00:00")]
    df = spark.createDataFrame(rows, "a string, b string, c string")
    spec = StandardizeSpec(
        columns=[
            ColumnSpec("a", date_regex=FDIC_INST[0], date_format=FDIC_INST[1]),
            ColumnSpec("b", date_regex=FDIC_FIN[0], date_format=FDIC_FIN[1]),
            ColumnSpec("c", date_regex=NCUA[0], date_format=NCUA[1]),
        ]
    )
    out = standardize(df, spec).collect()[0]
    expected = datetime.date(2020, 3, 31)
    assert out.a == expected and out.b == expected and out.c == expected


def test_malformed_dates_quarantined(spark):
    rows = [("3/31/2020",), ("2020-03-31",), ("",), ("13/99/20x0",)]
    df = spark.createDataFrame(rows, "d string")
    spec = StandardizeSpec(
        columns=[
            ColumnSpec(
                "d",
                name="quarter_date",
                date_regex=FDIC_INST[0],
                date_format=FDIC_INST[1],
                required=True,
            )
        ]
    )
    clean, quarantine = apply_with_quarantine(df, spec)
    assert clean.count() == 1
    q = quarantine.collect()
    assert len(q) == 3
    assert all(r._reject_reason == "quarter_date" for r in q)


def test_default_and_case_normalization(spark):
    rows = [("WwW.Ex.COM",), (None,), ("",)]
    df = spark.createDataFrame(rows, "w string")
    spec = StandardizeSpec(
        columns=[ColumnSpec("w", name="website", case="lower", default="Not Provided")]
    )
    vals = [r.website for r in standardize(df, spec).collect()]
    assert vals == ["www.ex.com", "Not Provided", "Not Provided"]


def test_literal_value_map_replaces_udf(spark):
    # state-abbrev dict analog (StateAbbreviationDict.py) -- unknown -> NULL
    rows = [("CA",), ("GU",), ("??",)]
    df = spark.createDataFrame(rows, "st string")
    spec = StandardizeSpec(
        columns=[
            ColumnSpec("st", name="state", value_map={"CA": "California", "GU": "Guam"})
        ]
    )
    vals = [r.state for r in standardize(df, spec).collect()]
    assert vals == ["California", "Guam", None]


def test_row_filter_active(spark):
    df = spark.createDataFrame([("1", "a"), ("0", "b")], "ACTIVE string, NAME string")
    spec = StandardizeSpec(
        row_filter="ACTIVE = 1",
        columns=[ColumnSpec("NAME", name="name", case="upper")],
    )
    assert [r.name for r in standardize(df, spec).collect()] == ["A"]


def test_null_or_empty_counts_single_pass(spark):
    df = spark.createDataFrame(
        [("x", None), ("", "y"), ("z", "")], "a string, b string"
    )
    row = null_or_empty_counts(df).collect()[0]
    assert row.a == 1 and row.b == 2


def test_select_sort_dated_cols(spark):
    df = spark.createDataFrame(
        [(1, "x", 10, 20)], "id int, name string, `2020-03-31` int, `2020-06-30` int"
    )
    out = select_sort_dated_cols(df, ["id", "name"], sort_desc=True)
    assert out.columns == ["id", "name", "2020-06-30", "2020-03-31"]


def test_constraint_report_single_pass_and_counts(spark):
    from bankcreditunion_datapipeline_spark.operators.clean import (
        constraint_report,
    )

    df = spark.createDataFrame(
        [(1, "x", 5), (2, None, -1), (3, "y", 0), (None, "z", 7)],
        "id long, name string, v long",
    )
    report = constraint_report(
        df,
        {
            "id_not_null": F.col("id").isNull(),
            "name_not_null": F.col("name").isNull(),
            "v_positive": F.col("v") <= 0,
        },
    )
    got = {r.constraint: (r.observed, r.passed) for r in report.collect()}
    assert got == {
        "id_not_null": (1, False),
        "name_not_null": (1, False),
        "v_positive": (2, False),
    }
    # all rules compile into ONE aggregate over one scan
    # one scan + one aggregate for ALL rules (AQE string repeats the plan
    # as "Initial Plan" -- inspect only the final section)
    plan = report._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]
    assert final_plan.count("Scan ExistingRDD") == 1
    assert final_plan.count("HashAggregate") == 2  # partial + final
