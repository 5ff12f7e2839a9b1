"""The derived rarity cap of fuzzy_match_join (operators/linkage.py) —
round-9 verdict item 1: an absolute gram-df cap silently zeroes recall once
every gram's df outgrows it (measured: ZERO surviving grams on the sf9
synthetic customer table).  The cap is now max(floor, df at the
rare_df_pct-th percentile of gram-type df), so at least pct% of gram types
always survive the gate and recall cannot silently collapse."""

from pyspark.sql import functions as F

from etl_healthcare_spark.operators.linkage import fuzzy_match_join


def _templated_corpus(spark):
    """70 clean names from a template so EVERY 3-gram has df > 2 (the
    absolute floor used below) — the degenerate regime the sf9 probe hit.
    70 = 7 x 10 keeps the per-digit gram df uniform (10), so the whole
    distinctive-gram tier sits on one side of the percentile cut."""
    clean = spark.createDataFrame(
        [(i, f"zzzcommonname{i % 7}") for i in range(70)], "cid long, cname string"
    )
    # dirty: one planted substitution in a template position
    dirty = spark.createDataFrame(
        [(1000 + i, f"zzzcoXmonname{i % 7}") for i in range(10)], "did long, dname string"
    )
    return dirty, clean


def test_absolute_cap_zeroes_recall_on_templated_corpus(spark):
    dirty, clean = _templated_corpus(spark)
    out = fuzzy_match_join(
        dirty, clean, "did", "dname", "cid", "cname",
        max_dist=2, q=3, max_gram_df=2, rare_df_pct=None,
    )
    assert out.count() == 0, "absolute cap should demonstrate the recall collapse"


def test_relative_cap_preserves_recall_where_absolute_empties(spark):
    dirty, clean = _templated_corpus(spark)
    out = fuzzy_match_join(
        dirty, clean, "did", "dname", "cid", "cname",
        max_dist=2, q=3, max_gram_df=2, rare_df_pct=10,
    ).collect()
    assert len(out) == 10, "every dirty row has a distance-1 true match"
    for r in out:
        assert r.distance == 1
        # the true match shares the trailing digit: did 100i -> template i%7
        assert r.match_name.endswith(r.dname[-1])


def test_relative_cap_noop_on_distinctive_corpus(spark):
    # Heaps-like regime: plenty of hapax grams -> the percentile sits at
    # df 1, far under the floor, so the derived cap EQUALS the floor and
    # results are identical to the absolute-cap behavior
    clean = spark.createDataFrame(
        [(i, f"alpha{i}beta{i * 7 % 101}") for i in range(80)], "cid long, cname string"
    )
    dirty = clean.select(
        F.col("cid").alias("did"),
        F.concat(F.expr("substr(cname, 1, 3)"), F.lit("X"), F.expr("substr(cname, 5)")).alias("dname"),
    )
    kw = dict(max_dist=2, q=3, max_gram_df=64)
    rel = fuzzy_match_join(dirty, clean, "did", "dname", "cid", "cname", rare_df_pct=10, **kw)
    absolute = fuzzy_match_join(dirty, clean, "did", "dname", "cid", "cname", rare_df_pct=None, **kw)
    assert sorted(map(tuple, rel.collect())) == sorted(map(tuple, absolute.collect()))
    assert rel.count() == 80
