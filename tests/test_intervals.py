"""overlapping_interval_pairs: bucketed range join vs brute force."""

from __future__ import annotations

import datetime as dt
import itertools

from bankcreditunion_datapipeline_spark.operators.intervals import (
    overlapping_interval_pairs,
)

D = dt.date


def _brute(rows):
    """All overlapping same-key pairs, smaller id first."""
    out = set()
    for a, b in itertools.combinations(rows, 2):
        if a[0] != b[0]:
            continue
        (lo, hi) = (a, b) if a[1] < b[1] else (b, a)
        if lo[2] <= hi[3] and hi[2] <= lo[3]:
            out.add((lo[0], lo[1], hi[1]))
    return out


def test_pairs_match_brute_force(spark):
    rows = [
        # key 1: chain of overlaps, one spanning several months
        (1, 10, D(2020, 1, 1), D(2020, 1, 20)),
        (1, 11, D(2020, 1, 15), D(2020, 2, 10)),
        (1, 12, D(2020, 2, 5), D(2020, 4, 25)),  # 4-month span
        (1, 13, D(2020, 3, 1), D(2020, 3, 2)),
        (1, 14, D(2020, 6, 1), D(2020, 6, 5)),   # isolated
        # key 2: same dates as key-1 rows -> must NOT pair across keys
        (2, 20, D(2020, 1, 1), D(2020, 1, 20)),
        (2, 21, D(2020, 1, 10), D(2020, 1, 12)),
        # touching endpoints overlap (inclusive intervals)
        (3, 30, D(2021, 5, 1), D(2021, 5, 10)),
        (3, 31, D(2021, 5, 10), D(2021, 5, 20)),
        # adjacent but NOT touching
        (4, 40, D(2021, 5, 1), D(2021, 5, 9)),
        (4, 41, D(2021, 5, 10), D(2021, 5, 20)),
    ]
    df = spark.createDataFrame(rows, "k long, id long, s date, e date")
    got = {
        (r["k"], r["a_id"], r["b_id"])
        for r in overlapping_interval_pairs(
            df, keys=["k"], id_cols=["id"], start_col="s", end_col="e"
        ).collect()
    }
    assert got == _brute(rows)
    # multi-month pair appears exactly ONCE despite sharing 2 buckets
    pairs = overlapping_interval_pairs(
        df, keys=["k"], id_cols=["id"], start_col="s", end_col="e"
    ).collect()
    assert len(pairs) == len(got)


def test_null_and_inverted_intervals_dropped(spark):
    rows = [
        (1, 1, D(2020, 1, 1), D(2020, 1, 31)),
        (1, 2, None, D(2020, 1, 15)),            # NULL start
        (1, 3, D(2020, 1, 10), None),            # NULL end
        (1, 4, D(2020, 1, 20), D(2020, 1, 5)),   # inverted
        (1, 5, D(2020, 1, 10), D(2020, 1, 12)),
    ]
    df = spark.createDataFrame(rows, "k long, id long, s date, e date")
    got = {
        (r["a_id"], r["b_id"])
        for r in overlapping_interval_pairs(
            df, keys=["k"], id_cols=["id"], start_col="s", end_col="e"
        ).collect()
    }
    assert got == {(1, 5)}


def test_composite_id_tiebreak(spark):
    # two rows with the same first id component: the second component
    # must break the tie so the pair appears exactly once
    rows = [
        (1, 7, 1, D(2020, 1, 1), D(2020, 1, 31)),
        (1, 7, 2, D(2020, 1, 10), D(2020, 1, 20)),
    ]
    df = spark.createDataFrame(rows, "k long, id1 long, id2 long, s date, e date")
    got = overlapping_interval_pairs(
        df, keys=["k"], id_cols=["id1", "id2"], start_col="s", end_col="e"
    ).collect()
    assert len(got) == 1
    assert (got[0]["a_id1"], got[0]["a_id2"], got[0]["b_id2"]) == (7, 1, 2)


def test_merge_intervals_islands_and_touching(spark):
    """Overlap and touching merge; a gap opens a new island; keys stay
    separate; results are layout-independent."""
    from bankcreditunion_datapipeline_spark.operators.intervals import (
        merge_intervals,
    )

    rows = [
        # key 1: [0,10] + [5,12] + [12,20] -> one island [0,20];
        # [25,30] -> second island
        (1, 1, 0, 10),
        (1, 2, 5, 12),
        (1, 3, 12, 20),
        (1, 4, 25, 30),
        # key 2: nested interval swallowed
        (2, 5, 0, 100),
        (2, 6, 10, 20),
        # key 2: far island
        (2, 7, 500, 600),
    ]
    df = spark.createDataFrame(rows, "k long, i long, s long, e long")
    out = sorted(
        (r["k"], r["s"], r["e"])
        for r in merge_intervals(
            df, ["k"], start_col="s", end_col="e", tiebreak_col="i"
        ).collect()
    )
    assert out == [(1, 0, 20), (1, 25, 30), (2, 0, 100), (2, 500, 600)]

    relaid = sorted(
        (r["k"], r["s"], r["e"])
        for r in merge_intervals(
            df.repartition(5, "e"), ["k"], "s", "e", "i"
        ).collect()
    )
    assert relaid == out


# -- interval_integrity --------------------------------------------------------


def test_interval_integrity_overlaps_gaps_coverage(spark):
    """Planted shape per key 1: [0,9], [5,14] overlap (concurrency 2),
    [20,24] after a gap -> 2 islands, covered 20 of span 25."""
    from bankcreditunion_datapipeline_spark.operators.intervals import (
        interval_integrity,
    )

    df = spark.createDataFrame(
        [(1, 0, 9), (1, 5, 14), (1, 20, 24), (2, 3, 3)],
        "k long, s long, e long",
    )
    rows = {
        r["k"]: r
        for r in interval_integrity(df, ["k"], "s", "e").collect()
    }
    r1 = rows[1]
    assert r1["n_intervals"] == 3
    assert r1["n_islands"] == 2
    assert r1["n_gaps"] == 1
    assert r1["span_units"] == 25
    assert r1["covered_units"] == 20  # [0,14] = 15 + [20,24] = 5
    assert r1["gap_units"] == 5
    assert r1["coverage_permille"] == 800
    assert r1["max_concurrency"] == 2
    r2 = rows[2]  # degenerate single-point interval
    assert (
        r2["n_intervals"],
        r2["n_islands"],
        r2["span_units"],
        r2["covered_units"],
        r2["max_concurrency"],
    ) == (1, 1, 1, 1, 1)


def test_interval_integrity_touching_merges_plus_one_gap_splits(spark):
    """merge_intervals semantics: end == next start merges; start ==
    prev end + 1 opens a new island (closed-interval day semantics
    would call that contiguous -- the operator documents the contract
    it inherits)."""
    from bankcreditunion_datapipeline_spark.operators.intervals import (
        interval_integrity,
    )

    df = spark.createDataFrame(
        [(1, 0, 5), (1, 5, 9), (2, 0, 5), (2, 6, 9)],
        "k long, s long, e long",
    )
    rows = {
        r["k"]: r
        for r in interval_integrity(df, ["k"], "s", "e").collect()
    }
    assert rows[1]["n_islands"] == 1 and rows[1]["max_concurrency"] == 2
    assert rows[2]["n_islands"] == 2 and rows[2]["max_concurrency"] == 1


def test_interval_integrity_triple_overlap_and_null_key(spark):
    from bankcreditunion_datapipeline_spark.operators.intervals import (
        interval_integrity,
    )

    df = spark.createDataFrame(
        [(None, 0, 10), (None, 2, 8), (None, 4, 6), (None, 100, 100)],
        "k string, s long, e long",
    )
    rows = interval_integrity(df, ["k"], "s", "e").collect()
    assert len(rows) == 1  # NULL key is a real stratum
    assert rows[0]["max_concurrency"] == 3
    assert rows[0]["n_islands"] == 2


def test_interval_integrity_reversed_interval_fails_loud(spark):
    import pytest

    from bankcreditunion_datapipeline_spark.operators.intervals import (
        interval_integrity,
    )

    df = spark.createDataFrame([(1, 9, 3)], "k long, s long, e long")
    with pytest.raises(Exception, match="end < start"):
        interval_integrity(df, ["k"], "s", "e").collect()
