"""Unit tests for the distributed Naive Bayes classifier
(operators/classifier.py) beyond the full-query oracle row
(tests/test_queries_oracle.py::nb_lang_predictions).
"""

import math

import pytest
from pyspark.sql import Row

from entity_resolution_spark.operators.classifier import (
    nb_evaluate,
    nb_predict,
    nb_train,
)


@pytest.fixture(scope="module")
def tiny(spark):
    train = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam offer offer buy", label="spam"),
            Row(doc_id=2, text="offer spam buy buy", label="spam"),
            Row(doc_id=3, text="meeting notes agenda review", label="ham"),
            Row(doc_id=4, text="review agenda notes notes", label="ham"),
            Row(doc_id=5, text="agenda meeting review notes", label="ham"),
        ]
    )
    return train


def test_predict_separates_classes(spark, tiny):
    model = nb_train(tiny, text_col="text", label_col="label")
    test = spark.createDataFrame(
        [
            Row(doc_id=10, text="buy spam offer"),
            Row(doc_id=11, text="agenda review meeting"),
        ]
    )
    got = {r["doc_id"]: r["pred_label"] for r in nb_predict(test, model).collect()}
    assert got == {10: "spam", 11: "ham"}


def test_empty_and_oov_docs_get_prior_argmax(spark, tiny):
    # 'ham' has 3 of 5 training docs -> larger prior; an empty doc and an
    # all-OOV doc must both survive with the prior-driven prediction.
    model = nb_train(tiny, text_col="text", label_col="label")
    test = spark.createDataFrame(
        [
            Row(doc_id=20, text=""),
            Row(doc_id=21, text=None),
            Row(doc_id=22, text="zzz qqq xxyy"),  # every token OOV
        ]
    )
    rows = nb_predict(test, model).collect()
    assert len(rows) == 3  # nothing dropped
    got = {r["doc_id"]: r["pred_label"] for r in rows}
    assert got[20] == "ham" and got[21] == "ham"
    # OOV tokens contribute log_default = ln(alpha/(tot_label + alpha*V)),
    # which is LARGER for the label with the smaller training corpus
    # (spam: tot=9 -> ln(1/16); ham: tot=12 -> ln(1/19)); three OOV tokens
    # overcome ham's prior edge: -0.916+3*ln(1/16) > -0.511+3*ln(1/19).
    assert got[22] == "spam"


def test_vocab_and_loglik_exact(spark, tiny):
    model = nb_train(tiny, text_col="text", label_col="label", alpha=1.0)
    v = model.vocab_size
    assert v == 7  # spam offer buy meeting notes agenda review
    lik = {(r["label"], r["token"]): r["loglik"] for r in model.likelihood.collect()}
    # spam corpus: spam=3, offer=3, buy=3, tot=9
    assert lik[("spam", "buy")] == pytest.approx(math.log((3 + 1) / (9 + 7)), abs=1e-12)
    labs = {r["label"]: r for r in model.labels.collect()}
    assert labs["spam"]["log_prior"] == pytest.approx(math.log(2 / 5), abs=1e-12)
    assert labs["spam"]["log_default"] == pytest.approx(math.log(1 / (9 + 7)), abs=1e-12)


def test_evaluate_confusion_counts(spark, tiny):
    model = nb_train(tiny, text_col="text", label_col="label")
    test = spark.createDataFrame(
        [
            Row(doc_id=30, text="spam offer", label="spam"),
            Row(doc_id=31, text="agenda notes", label="ham"),
            Row(doc_id=32, text="spam buy offer", label="ham"),  # will confuse
        ]
    )
    preds = nb_predict(test, model)
    conf = {
        (r["label"], r["pred_label"]): r["n"]
        for r in nb_evaluate(preds, test, "doc_id", "label").collect()
    }
    assert conf[("spam", "spam")] == 1
    assert conf[("ham", "ham")] == 1
    assert conf[("ham", "spam")] == 1


def test_nb_model_save_load_roundtrip(spark, tiny, tmp_path):
    from entity_resolution_spark.operators.classifier import (
        load_nb_model,
        save_nb_model,
    )

    model = nb_train(tiny, text_col="text", label_col="label")
    test = spark.createDataFrame(
        [Row(doc_id=40, text="spam offer buy"), Row(doc_id=41, text="agenda notes")]
    )
    want = sorted(map(tuple, nb_predict(test, model).collect()))
    save_nb_model(model, str(tmp_path / "nb"))
    loaded = load_nb_model(spark, str(tmp_path / "nb"))
    assert loaded.vocab_size == model.vocab_size and loaded.alpha == model.alpha
    assert sorted(map(tuple, nb_predict(test, loaded).collect())) == want
