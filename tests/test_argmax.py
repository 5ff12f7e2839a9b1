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


def _null_df(spark):
    rows = [
        # group "n": NULL order values lose to the non-NULL max
        ("n", 5, 1, "n-5"),
        ("n", None, 2, "n-null"),
        # group "allnull": every order value NULL -> rows KEPT, o2 tiebreaks
        ("allnull", None, 1, "an-1"),
        ("allnull", None, 9, "an-9"),
        # NULL group key: forms its own group, not dropped
        (None, 3, 1, "g-null-3"),
        (None, 8, 1, "g-null-8"),
    ]
    return spark.createDataFrame(rows, "grp string, o1 int, o2 int, payload string")


def test_argmax_null_order_loses_to_non_null(spark):
    got = [r.payload for r in argmax_rows(_null_df(spark), ["grp"], ["o1", "o2"]).where(F.col("grp") == "n").collect()]
    assert got == ["n-5"]


def test_argmax_all_null_order_group_kept_and_tiebroken(spark):
    # round-9 ADVICE: a plain equality join-back silently dropped these groups
    got = [
        r.payload
        for r in argmax_rows(_null_df(spark), ["grp"], ["o1", "o2"]).where(F.col("grp") == "allnull").collect()
    ]
    assert got == ["an-9"]


def test_argmax_null_group_key_kept(spark):
    got = [r.payload for r in argmax_rows(_null_df(spark), ["grp"], ["o1", "o2"]).where(F.col("grp").isNull()).collect()]
    assert got == ["g-null-8"]


def test_argmin_null_order_loses_to_non_null(spark):
    # for argmin the NULLs also lose: min ignores NULLs, so NULL sorts LAST
    got = [r.payload for r in argmin_rows(_null_df(spark), ["grp"], ["o1", "o2"]).where(F.col("grp") == "n").collect()]
    assert got == ["n-5"]
