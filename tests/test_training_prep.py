"""Unit tests for the training-prep batch: prototype pruning, curriculum
interleave, weighted median — planted inputs checked against brute-force
pure-Python models."""

import math

from pyspark.sql import functions as F

from etl_healthcare_spark.operators.sampling import interleave_order, prototype_prune
from etl_healthcare_spark.operators.stats import weighted_median


def _q(x, scale):
    """float32 storage round-trip, then the exact double*scale floor —
    matching quantize_vec over an array<float> column."""
    import numpy as np

    return math.floor(float(np.float32(x)) * scale)


def _brute_assign(vecs, protos, scale=1000):
    """Pure-Python model of the signed sqrt-free argmax-cosine surrogate."""
    out = {}
    for vid, v in vecs.items():
        qv = [_q(x, scale) for x in v]
        best = None
        for pid in sorted(protos):
            qp = [_q(x, scale) for x in protos[pid]]
            d = sum(a * b for a, b in zip(qv, qp))
            n2p = sum(a * a for a in qp)
            mag = (d * d * 1_000_000) // n2p
            s = mag if d >= 0 else -mag
            # tiebreak: higher s wins, then LOWER proto id
            if best is None or (s, -pid) > (best[1], -best[0]):
                best = (pid, s)
        out[vid] = best
    return out


def test_prototype_prune_matches_brute_force_assignment(spark):
    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0],
        2: [0.9, 0.1, 0.0],
        3: [0.1, 0.9, 0.0],
        4: [-1.0, 0.0, 0.0],
        5: [0.7, 0.7, 0.0],
        6: [0.0, 0.0, 1.0],
    }
    df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    out = {
        r.vec_id: r
        for r in prototype_prune(
            df, "embedding", "vec_id", F.col("vec_id") <= 1, prune_ppm=500_000
        ).collect()
    }
    protos = {0: vecs[0], 1: vecs[1]}
    model = _brute_assign(vecs, protos)
    for vid in vecs:
        assert out[vid].proto_id == model[vid][0], vid
        assert out[vid].rank_key == model[vid][1], vid
    # cluster ranks are dense 1..n and the most-prototypical half is pruned
    for pid in (0, 1):
        members = sorted(
            (r for r in out.values() if r.proto_id == pid), key=lambda r: r.rk
        )
        assert [m.rk for m in members] == list(range(1, len(members) + 1))
        drop_n = (len(members) * 500_000) // 1_000_000
        assert [m.kept for m in members] == [i >= drop_n for i in range(len(members))]


def test_interleave_order_is_injective_and_round_robin(spark):
    rows = [
        (1, "a", 10), (2, "a", 5), (3, "a", 7),
        (4, "b", 1), (5, "b", 9),
        (6, "c", 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = sorted(
        interleave_order(df, "doc_id", "source", "n_chars").collect(),
        key=lambda r: r.global_order,
    )
    orders = [r.global_order for r in out]
    assert len(set(orders)) == len(orders), "global_order must be injective"
    # first full round visits each source once, easiest-first within source:
    # a->doc 2 (5), b->doc 4 (1), c->doc 6 (4); src_idx order a=0,b=1,c=2
    assert [(r.doc_id, r.source) for r in out[:3]] == [(2, "a"), (4, "b"), (6, "c")]
    # second round: a's next-easiest (doc 3), then b's (doc 5)
    assert [(r.doc_id, r.source) for r in out[3:5]] == [(3, "a"), (5, "b")]
    assert [r.doc_id for r in out[5:]] == [1]


def test_weighted_median_crosses_half_total_weight(spark):
    rows = [
        # grp x: values 1,2,3 with weights 1,1,10 -> total 12, half 6:
        # cum at v=1:1, v=2:2, v=3:12 -> weighted median 3 (300 cents)
        ("x", 1.0, 1, 1), ("x", 2.0, 1, 2), ("x", 3.0, 10, 3),
        # grp y: values 5,7 weights 1,1 -> 2*cum(5)=2 >= 2 -> lower median 5
        ("y", 5.0, 1, 4), ("y", 7.0, 1, 5),
    ]
    df = spark.createDataFrame(rows, "grp string, value double, wt long, id long")
    out = {r.grp: r for r in weighted_median(df, "grp", "value", "wt", "id").collect()}
    assert out["x"].w_median_cents == 300 and out["x"].total_weight == 12
    assert out["y"].w_median_cents == 500 and out["y"].total_weight == 2


def test_interleave_order_keeps_null_source_rows_as_unk(spark):
    # ADVICE r3: a NULL source must not fall out of the "total training
    # order" — it coalesces to the 'unk' sentinel (mixture_plan's rule)
    rows = [(1, "a", 10), (2, None, 5), (3, "a", 7), (4, None, 9)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r.doc_id: r for r in interleave_order(df, "doc_id", "source", "n_chars").collect()}
    assert len(out) == 4, "NULL-source rows must stay in the order"
    assert out[2].source == "unk" and out[4].source == "unk"
    orders = sorted(r.global_order for r in out.values())
    assert len(set(orders)) == 4
    # 'unk' sorts after 'a': src_idx a=0, unk=1; easiest-first within unk
    assert out[2].global_order < out[4].global_order


def test_prototype_prune_rejects_zero_norm_prototype(spark):
    import pytest

    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(AssertionError, match="zero norm"):
        prototype_prune(df, "embedding", "vec_id", F.col("vec_id") == 0)


def test_hard_negatives_pred_uses_caller_id_name(spark):
    # ADVICE r3: query_pred written against the column name the caller
    # actually passed (vec_id), not the operator's private alias
    from etl_healthcare_spark.operators.similarity import hard_negatives

    rows = [(0, [1.0, 0.0]), (1, [1.0, 1.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = hard_negatives(
        df, "embedding", "vec_id", query_pred=F.col("vec_id") == 0,
        lo_ppm=300_000, hi_ppm=800_000, k=5,
    ).collect()
    assert [(r.anchor_id, r.negative_id) for r in out] == [(0, 1)]
