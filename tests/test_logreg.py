"""Distributed logistic regression vs a NumPy reference: identical
full-batch GD trajectory (same init, lr, iteration count) and a
sanity check that the fit actually separates a separable signal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datanika_core_spark.operators.logreg import predict_proba, train_logreg
from datanika_core_spark.session import read_table

SF = "/root/testdata/sf0.001"
FEATURES = ["f_len", "f_stop", "f_digits"]


@pytest.fixture(scope="module")
def labeled(spark):
    """Deterministic labeled frame from documents: features are text
    stats; the label is a noiseless linear rule over them, so GD
    must drive training accuracy high."""
    docs = read_table(spark, f"{SF}/documents.parquet")
    df = docs.select(
        "doc_id",
        (F.length("text") / 200.0).alias("f_len"),
        (
            F.size(
                F.filter(
                    F.split(F.lower("text"), r"\s+"),
                    lambda t: t.isin("the", "a", "of", "and"),
                )
            )
            / 20.0
        ).alias("f_stop"),
        (
            F.length(F.regexp_replace("text", r"[^0-9]", "")) / 10.0
        ).alias("f_digits"),
    )
    return df.withColumn(
        "label",
        (
            F.col("f_len") + 2 * F.col("f_stop") - F.col("f_digits")
            > F.lit(1.0)
        ).cast("int"),
    ).cache()


def _np_train(X, y, iters, lr):
    w = np.zeros(X.shape[1] + 1)
    Xb = np.hstack([np.ones((X.shape[0], 1)), X])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        grad = Xb.T @ (p - y) / len(y)
        w = w - lr * grad
    return w


def test_gd_trajectory_matches_numpy(spark, labeled):
    rows = sorted(labeled.collect(), key=lambda r: r.doc_id)
    X = np.array([[r.f_len, r.f_stop, r.f_digits] for r in rows])
    y = np.array([float(r.label) for r in rows])
    got = np.array(train_logreg(labeled, FEATURES, "label", iters=15, lr=0.5))
    want = _np_train(X, y, iters=15, lr=0.5)
    assert np.allclose(got, want, atol=1e-9)


def test_fit_separates_the_signal(spark, labeled):
    w = train_logreg(labeled, FEATURES, "label", iters=60, lr=1.0)
    scored = predict_proba(labeled, FEATURES, w)
    acc_row = scored.agg(
        F.avg(
            ((F.col("proba") > 0.5).cast("int") == F.col("label")).cast(
                "int"
            )
        ).alias("acc")
    ).collect()[0]
    assert acc_row["acc"] >= 0.9
