"""train() streaming-expression analog (ops/pipeline.train_logreg;
ref SJ/io/stream/TextLogitStream): DataFrame-only batch GD learns a
separable token signal and its weights drive classify-style margins."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.ops.pipeline import train_logreg


@pytest.fixture(scope="module")
def labeled(spark):
    # deterministic corpus: label 1 iff the text contains 'spark'
    rows = []
    for i in range(200):
        has = i % 3 == 0
        toks = ["alpha", "beta" if i % 2 else "gamma"]
        if has:
            toks.append("spark")
        rows.append((i, " ".join(toks), 1 if has else 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_recovers_separating_feature(labeled):
    model = train_logreg(labeled, "y", ["spark", "beta"], iters=40, lr=1.0)
    # the real signal gets a strongly positive weight; the noise token ~0
    assert model["spark"] > 1.0
    assert abs(model["beta"]) < 0.5
    # margins classify the training set correctly
    w_spark, w_beta, b = model["spark"], model["beta"], model["__bias__"]
    rows = labeled.select(
        "y",
        (
            F.lit(b)
            + F.lit(w_spark) * F.array_contains(F.split("text", " "), "spark").cast("double")
            + F.lit(w_beta) * F.array_contains(F.split("text", " "), "beta").cast("double")
        ).alias("m"),
    ).collect()
    acc = sum((r.m > 0) == (r.y == 1) for r in rows) / len(rows)
    assert acc == 1.0


def test_loss_decreases(labeled):
    def loss(model):
        w_spark, b = model.get("spark", 0.0), model["__bias__"]
        rows = labeled.select(
            "y",
            F.array_contains(F.split("text", " "), "spark").cast("double").alias("x"),
        ).collect()
        tot = 0.0
        for r in rows:
            z = b + w_spark * r.x
            p = 1.0 / (1.0 + math.exp(-z))
            p = min(max(p, 1e-12), 1 - 1e-12)
            tot += -(r.y * math.log(p) + (1 - r.y) * math.log(1 - p))
        return tot / len(rows)

    l1 = loss(train_logreg(labeled, "y", ["spark"], iters=2, lr=0.5))
    l2 = loss(train_logreg(labeled, "y", ["spark"], iters=25, lr=0.5))
    assert l2 < l1
