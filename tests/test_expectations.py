"""Declarative expectations engine (operators/expectations.py)."""

from __future__ import annotations

from bankcreditunion_datapipeline_spark.operators.expectations import (
    check_expectations,
    quarantine_violations,
)


RULES = [
    ("positive", "v > 0"),
    ("named", "name IS NOT NULL"),
    ("short_name", "length(name) <= 5"),
]


def _df(spark):
    rows = [
        (1, 10.0, "ok"),
        (2, -1.0, "neg"),
        (3, None, "nullv"),      # NULL predicate must count as FAIL
        (4, 5.0, None),
        (5, 2.0, "toolongname"),
    ]
    return spark.createDataFrame(rows, "id long, v double, name string")


def test_check_expectations_single_pass_counts(spark):
    out = {
        r["rule"]: (r["n_rows"], r["n_pass"], r["n_fail"], r["pass_t"])
        for r in check_expectations(_df(spark), RULES).collect()
    }
    assert out["positive"] == (5, 3, 2, 0.6)      # NULL v fails
    assert out["named"] == (5, 4, 1, 0.8)
    assert out["short_name"] == (5, 3, 2, 0.6)    # NULL name fails here too
    # one job, no shuffle wider than the global aggregate
    plan = check_expectations(_df(spark), RULES)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_quarantine_tags_which_rules_failed(spark):
    got = {
        r["id"]: r["failed_rules"]
        for r in quarantine_violations(_df(spark), RULES).collect()
    }
    # rule order preserved in the tag
    assert got[2] == "positive"
    assert got[3] == "positive"      # NULL v fails positive; name 'nullv' ok
    assert got[4] == "named,short_name"  # NULL name fails both name rules
    assert got[5] == "short_name"
    assert 1 not in got              # clean row never quarantined


def test_expectations_quoted_rule_name_and_empty_rules(spark):
    """ADVICE r5: a rule name containing a single quote must survive the
    stack() interpolation, and an empty rule set must raise a clear
    ValueError instead of stack(0,) analysis garbage."""
    import pytest
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        check_expectations,
    )

    out = {
        r["rule"]: r["n_pass"]
        for r in check_expectations(
            _df(spark), [("bob's rule", "v > 0")]
        ).collect()
    }
    assert out == {"bob's rule": 3}

    with pytest.raises(ValueError, match="non-empty"):
        check_expectations(_df(spark), [])


# -- column_diff_summary -----------------------------------------------------


def test_column_diff_counts_added_removed_changed(spark):
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        column_diff_summary,
    )

    a = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [(1, "x", 10.0), (2, "CHANGED", 20.0), (4, "new", 40.0)],
        "k long, s string, v double",
    )
    got = {
        r.metric: r.n
        for r in column_diff_summary(a, b, ["k"], ["s", "v"]).collect()
    }
    assert got == {
        "rows_added": 1,
        "rows_removed": 1,
        "rows_matched": 2,
        "changed_s": 1,
        "changed_v": 0,
    }


def test_column_diff_null_key_and_null_value_transitions(spark):
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        column_diff_summary,
    )

    # NULL keys reconcile via eqNullSafe; NULL<->value counts as change
    a = spark.createDataFrame([(None, "x"), (1, None)], "k long, s string")
    b = spark.createDataFrame([(None, "x"), (1, "now")], "k long, s string")
    got = {
        r.metric: r.n
        for r in column_diff_summary(a, b, ["k"], ["s"]).collect()
    }
    assert got == {
        "rows_added": 0,
        "rows_removed": 0,
        "rows_matched": 2,
        "changed_s": 1,
    }


def test_column_diff_requires_compare_cols(spark):
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        column_diff_summary,
    )
    import pytest

    a = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        column_diff_summary(a, a, ["k"], [])


# -- fd_violation_report -----------------------------------------------------


def test_fd_report_hand_case(spark):
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        fd_violation_report,
    )

    # a->b: key 1 maps to {x}, key 2 maps to {x, y} (violation), key 3
    # maps to {x, NULL} (violation: NULL counts as a value)
    rows = [(1, "x"), (2, "x"), (2, "y"), (3, "x"), (3, None), (None, "z")]
    df = spark.createDataFrame(rows, "a long, b string")
    r = {x.fd: x for x in fd_violation_report(df, [("a", "b")]).collect()}
    rep = r["a->b"]
    assert (rep.n_groups, rep.n_violating, rep.max_distinct_rhs) == (3, 2, 2)
    assert rep.violation_permille == 666


def test_fd_report_requires_fds(spark):
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        fd_violation_report,
    )
    import pytest

    df = spark.createDataFrame([(1, 1)], "a long, b long")
    with pytest.raises(ValueError):
        fd_violation_report(df, [])


# -- measure_reconciliation --------------------------------------------------


def test_measure_reconciliation_hand_case(spark):
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        measure_reconciliation,
    )

    parent = spark.createDataFrame(
        [(1, 100), (2, 50), (3, 70)], "k long, pv long"
    )
    child = spark.createDataFrame(
        # order 1 adds up; order 2 is off by 5; order 3 has no children
        [(1, 60), (1, 40), (2, 45)], "k long, cv long"
    )
    r = measure_reconciliation(parent, child, "k", "k", "pv", "cv").collect()[0]
    assert (r.n_parents, r.n_childless, r.n_exact) == (3, 1, 1)
    assert r.mismatch_permille == 333
    assert r.max_abs_delta == 5


def test_column_value_overlap_hand_values(spark):
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        column_value_overlap,
    )

    a = spark.createDataFrame([(1,), (2,), (3,), (3,), (None,)], "k int")
    b = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    c = spark.createDataFrame([(9,)], "k int")
    rows = {
        (r["col_a"], r["col_b"]): r
        for r in column_value_overlap(
            [("a.k", a, "k"), ("b.k", b, "k"), ("c.k", c, "k")]
        ).collect()
    }
    r = rows[("a.k", "b.k")]
    # a = {1,2,3} (dup + NULL dropped), b = {2,3,4}: shared 2, union 4
    assert (r["n_a"], r["n_b"], r["n_shared"]) == (3, 3, 2)
    assert r["jaccard_permille"] == 500
    assert r["containment_a_permille"] == 666
    assert r["containment_b_permille"] == 666
    # zero-overlap pairs are absent by construction
    assert ("a.k", "c.k") not in rows and ("b.k", "c.k") not in rows


def test_column_value_overlap_fk_signature(spark):
    """A strict subset column reads containment 1000 on the subset
    side -- the FK-candidate signature."""
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        column_value_overlap,
    )

    dim = spark.createDataFrame([(i,) for i in range(10)], "k int")
    fact = spark.createDataFrame([(i % 3,) for i in range(100)], "k int")
    r = column_value_overlap(
        [("dim.k", dim, "k"), ("fact.k", fact, "k")]
    ).collect()[0]
    assert (r["col_a"], r["col_b"]) == ("dim.k", "fact.k")
    assert r["n_b"] == 3 and r["containment_b_permille"] == 1000
    assert r["containment_a_permille"] == 300


# -- k_anonymity_audit ---------------------------------------------------------


def test_k_anonymity_audit_counts_and_l_diversity(spark):
    """Cells: (a,x) has 3 rows / 2 distinct sensitive; (a,y) 1 row;
    (b,x) 1 row with NULL sensitive -> l = 0.  k=2: two cells below,
    2 of 5 rows re-identifiable."""
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        k_anonymity_audit,
    )

    df = spark.createDataFrame(
        [
            ("a", "x", 10.0),
            ("a", "x", 10.0),
            ("a", "x", 20.0),
            ("a", "y", 30.0),
            ("b", "x", None),
        ],
        "q1 string, q2 string, sens double",
    )
    row = k_anonymity_audit(df, ["q1", "q2"], "sens", k=2).collect()[0]
    assert row["n_rows"] == 5
    assert row["n_cells"] == 3
    assert row["k_min"] == 1
    assert row["cells_below_k"] == 2
    assert row["rows_below_k"] == 2
    assert row["rows_below_k_permille"] == 400
    assert row["l_min"] == 0  # the all-NULL-sensitive cell leaks nothing
    assert row["k_threshold"] == 2


def test_k_anonymity_audit_null_qi_is_its_own_cell(spark):
    from bankcreditunion_datapipeline_spark.operators.expectations import (
        k_anonymity_audit,
    )

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("a", 3.0)],
        "q1 string, sens double",
    )
    row = k_anonymity_audit(df, ["q1"], "sens", k=2).collect()[0]
    assert row["n_cells"] == 2  # NULL groups together, not per-row
    assert row["k_min"] == 1
    assert row["l_min"] == 1
