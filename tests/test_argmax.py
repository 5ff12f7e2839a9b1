"""Unit semantics of the two-phase hash argmax (operators/argmax.py): the
low-partial-collapse latest/best-pick kernel u7/p4/j7/survivorship ride.
Plan shape is pinned in test_plans/test_plan_sweep; this file pins the
VALUES: lexicographic order, tie handling, the multi-phase cascade, and the
fixed-width-only contract."""

import pytest
from pyspark.sql import functions as F

from etl_healthcare_spark.operators.argmax import argmax_rows, argmin_rows


def _df(spark):
    rows = [
        # (grp, o1, o2, payload)
        ("a", 1, 10, "a-1-10"),
        ("a", 2, 5, "a-2-5"),
        ("a", 2, 9, "a-2-9"),   # winner: max o1=2, then max o2=9
        ("b", 7, 1, "b-7-1"),   # sole row
        ("c", 3, 3, "c-3-3"),
        ("c", 3, 3, "c-3-3b"),  # exact (o1, o2) duplicate: BOTH survive
    ]
    return spark.createDataFrame(rows, "grp string, o1 int, o2 int, payload string")


def test_argmax_lexicographic_with_tiebreak(spark):
    out = {
        r.grp: r.payload
        for r in argmax_rows(_df(spark), ["grp"], ["o1", "o2"]).where(F.col("grp") != "c").collect()
    }
    assert out == {"a": "a-2-9", "b": "b-7-1"}


def test_argmax_exact_order_duplicates_all_survive(spark):
    got = sorted(
        r.payload for r in argmax_rows(_df(spark), ["grp"], ["o1", "o2"]).where(F.col("grp") == "c").collect()
    )
    # duplicated (grp, o1, o2) is the documented caller-contract violation:
    # every maximal row returns rather than an arbitrary pick
    assert got == ["c-3-3", "c-3-3b"]


def test_argmin_mirrors(spark):
    out = {r.grp: r.payload for r in argmin_rows(_df(spark), ["grp"], ["o1", "o2"]).collect()}
    assert out["a"] == "a-1-10" and out["b"] == "b-7-1"


def test_argmax_global_no_group_cols(spark):
    got = argmax_rows(_df(spark), [], ["o1", "o2"]).collect()
    assert len(got) == 1 and got[0].payload == "b-7-1"


def test_argmax_rejects_non_fixed_width_order(spark):
    with pytest.raises(ValueError, match="non-fixed-width"):
        argmax_rows(_df(spark), ["grp"], ["payload"])
