"""SentimentPipeline end-to-end tests.

The accuracy gate reproduces the reference's published metric —
0.7344 test accuracy (`/root/reference/experiments/
NAIVE_BAYES_20250908_082227/metrics.yml:1`) — on a synthetic
sentiment corpus constructed so the Bayes-optimal accuracy is
0.7344 by design: each document carries class-consistent signal
words, except a deterministic 26.56% whose signal is flipped (the
flipped docs are indistinguishable from the opposite class, so any
classifier that learns the signal words scores exactly the
non-flipped fraction).  Parity is semantic, ±0.01 (BASELINE.md:
bitwise split parity across sklearn↔Spark RNGs is impossible,
SURVEY §7.4).
"""

from __future__ import annotations

import json
import os
import random

import pytest

from bigdata_lab4_spark.ml import SentimentModel, SentimentPipeline
from bigdata_lab4_spark.ml.pipeline import (
    NEGATIVE,
    POSITIVE,
    load_tweets_csv,
    train_test_split,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

N_DOCS = 10_000
FLIP_PERMILLE = 2656  # 26.56% flipped → Bayes accuracy 0.7344


def _make_corpus():
    """Deterministic synthetic sentiment rows (id, label, text)."""
    pos = [f"glad{i}" for i in range(30)]
    neg = [f"grim{i}" for i in range(30)]
    neut = [f"stuff{i}" for i in range(30)]
    rows = []
    for i in range(N_DOCS):
        label = i % 2
        flipped = (i * 7919) % 10_000 < FLIP_PERMILLE
        eff = label ^ flipped
        rng = random.Random(i)
        words = rng.choices(pos if eff else neg, k=4) + rng.choices(neut, k=2)
        rows.append((i, label, " ".join(words)))
    return rows


@pytest.fixture(scope="module")
def fitted(spark):
    rows = _make_corpus()
    df = spark.createDataFrame(rows, ["id", "label", "text"])
    train = df.filter("id % 5 != 0")
    test = df.filter("id % 5 = 0")
    # tfidf_fit_df=df reproduces the reference's fit-before-split
    # leakage quirk (`src/preprocess.py:50-55`) for metric parity.
    model = SentimentPipeline().fit(train, tfidf_fit_df=df)
    return model, test


def test_accuracy_matches_reference_gate(fitted):
    model, test = fitted
    metrics = model.evaluate(test)
    assert metrics["n"] == N_DOCS // 5
    assert metrics["accuracy"] == pytest.approx(0.7344, abs=0.01)


def test_save_load_roundtrip_and_run_metadata(fitted, tmp_path):
    model, test = fitted
    path = str(tmp_path / "sentiment")
    metrics = model.evaluate(test)
    model.save(path, metrics=metrics)

    # immutable per-run metadata (S5) replaces the reference's
    # mutable config.ini (`src/train.py:63-71`)
    with open(os.path.join(path, "run.json")) as f:
        run = json.load(f)
    assert run["params"]["alpha"] == 1.0
    assert run["params"]["model_type"] == "multinomial"
    assert run["metrics"]["accuracy"] == pytest.approx(metrics["accuracy"])

    loaded = SentimentModel.load(path)
    sample = test.limit(50)
    before = [r["sentiment"] for r in model.transform(sample).collect()]
    after = [r["sentiment"] for r in loaded.transform(sample).collect()]
    assert before == after
    assert loaded.evaluate(test)["accuracy"] == pytest.approx(
        metrics["accuracy"]
    )


def test_predict_one_matches_batch_path(fitted, spark):
    """U5: driver-local single-row scoring must agree with the
    distributed batch path on the reference's golden fixtures
    (`tests/fixtures/golden_0.json`, mirroring
    `/root/reference/tests/test_data`)."""
    model, _ = fitted
    with open(os.path.join(FIXTURES, "golden_0.json")) as f:
        golden = json.load(f)
    texts = list(golden["X"][0].values())
    # plus in-distribution messages with known signal
    texts += ["glad1 glad2 stuff0", "grim7 grim8 stuff3", "glad0", "unseen words only"]
    batch = model.transform(
        spark.createDataFrame([(t,) for t in texts], ["text"])
    ).collect()
    for row in batch:
        assert model.predict_one(row["text"]) == row["sentiment"]
    assert model.predict_one("glad1 glad2 stuff0") == POSITIVE
    assert model.predict_one("grim7 grim8 stuff3") == NEGATIVE


def test_predict_one_empty_message_guard(fitted):
    """Reference raises on missing message (`src/predict.py:75-80`)."""
    model, _ = fitted
    with pytest.raises(ValueError, match="Message is not provided"):
        model.predict_one("")


def test_pipeline_on_tweets_fixture(spark, tmp_path):
    """Smoke: the reference's actual ingest shape — latin-1 CSV with
    ItemID/Sentiment/SentimentText (`src/preprocess.py:46`) — trains
    and scores end-to-end."""
    df = load_tweets_csv(spark, os.path.join(FIXTURES, "tweets.csv"), encoding="UTF-8")
    assert df.columns == ["id", "label", "text"]
    model = SentimentPipeline(max_features=100).fit(df)
    scored = model.transform(df)
    assert scored.count() == df.count()
    assert set(r["sentiment"] for r in scored.collect()) <= {POSITIVE, NEGATIVE}


def test_train_test_split_deterministic(spark):
    df = spark.range(1000)
    a_train, a_test = train_test_split(df, test_size=0.2, seed=42)
    b_train, b_test = train_test_split(df, test_size=0.2, seed=42)
    assert sorted(r["id"] for r in a_test.collect()) == sorted(
        r["id"] for r in b_test.collect()
    )
    assert a_train.count() + a_test.count() == 1000
    with pytest.raises(ValueError):
        train_test_split(df, test_size=1.5)


def test_fit_prior_false_rejected():
    with pytest.raises(ValueError, match="fit_prior"):
        SentimentPipeline(fit_prior=False)
