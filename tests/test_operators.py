"""Operator-level checks not covered by the SQL oracles: the Arrow ANN
kernel, signature determinism, degenerate word-set joins, quarantine
round-trip."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from dataengineeringpipeline_spark import quality
from dataengineeringpipeline_spark.datalake import Lake
from dataengineeringpipeline_spark.operators import dedup, similarity


def _embeddings(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_arrow_ann_matches_fold_topk(spark, sf_dir):
    """The numpy-matmul scale kernel must return the same neighbor ids and
    ranks as the deterministic fold version (cosines may differ in the
    last ulp — that is the documented trade)."""
    emb = _embeddings(spark, sf_dir)
    fold = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ann_bruteforce_topk(emb, k=5).collect()
    }
    arrow = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ann_topk_arrow(emb, k=5).collect()
    }
    assert fold == arrow


def test_lsh_signatures_partitioning_independent(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    one = {r["vec_id"]: r["bucket"] for r in similarity.lsh_signatures(emb).collect()}
    many = {
        r["vec_id"]: r["bucket"]
        for r in similarity.lsh_signatures(emb.repartition(13)).collect()
    }
    assert one == many


def test_minhash_signatures_partitioning_independent(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    one = {r["doc_id"]: r["sig_0"] for r in dedup.minhash_signatures(docs).collect()}
    many = {
        r["doc_id"]: r["sig_0"]
        for r in dedup.minhash_signatures(docs.repartition(17)).collect()
    }
    assert one == many


def test_word_jaccard_identical_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma"),
            Row(doc_id=2, text="gamma beta alpha"),  # reordering: word-set identical
            Row(doc_id=3, text="delta epsilon zeta"),
        ]
    )
    pairs = dedup.word_jaccard_pairs(docs, threshold=0.9).collect()
    assert [(p["doc_a"], p["doc_b"], p["jaccard"]) for p in pairs] == [(1, 2, 1.0)]


def test_quarantine_roundtrip(spark, sf_dir, tmp_path):
    from dataengineeringpipeline_spark import cleaning

    lake = Lake(str(tmp_path / "lake"))
    silver = cleaning.clean_orders(spark.read.parquet(os.path.join(sf_dir, "orders.parquet")))
    rules = (quality.Rule("small_orders_only", "total_price < 100000", 0.99),)
    data_path, report_path = quality.quarantine(silver, rules, lake, "orders")
    bad = spark.read.parquet(data_path)
    assert bad.count() == silver.filter(~F.expr("total_price < 100000")).count()
    assert bad.count() > 0
    assert "quarantine_timestamp" in bad.columns
    assert os.path.isdir(report_path)
