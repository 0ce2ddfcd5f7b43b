"""Curation-funnel test: monotone funnel, observable counts, disjoint
leak-free split."""

from __future__ import annotations

from bankcreditunion_datapipeline_spark.plans.curation import curate_documents
from bankcreditunion_datapipeline_spark.sources.files import read_testdata


def test_curation_funnel(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents")
    res = curate_documents(docs, min_quality=0.2)
    f = res.funnel
    # every gate can only shrink the set
    order = ["input", "lang_gate", "quality_gate", "length_gate", "exact_dedup", "near_dedup"]
    for prev, nxt in zip(order, order[1:]):
        assert f[nxt] <= f[prev], (prev, nxt, f)
    assert f["near_dedup"] == f["train"] + f["holdout"]
    assert f["train"] > 0 and f["holdout"] > 0
    # split is key-disjoint
    assert res.train.join(res.holdout, "doc_id").count() == 0
    # gates actually fired on this fixture (not a pass-through pipeline)
    assert f["near_dedup"] < f["input"]
