"""SklearnTfidf parity tests — IDF values hand-computed from the
sklearn formula ``idf(t) = ln((1+N)/(1+df(t))) + 1`` (smooth_idf),
vocabulary capped by corpus term frequency, alphabetical index
order, L2 row norm (reference config:
`/root/reference/src/preprocess.py:40`)."""

from __future__ import annotations

import math

import pytest

from bigdata_lab4_spark.ml import SklearnTfidf, SklearnTfidfModel

DOCS = [
    ("apple banana apple",),
    ("banana cherry",),
    ("cherry cherry durian",),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["text"])


def _fit(corpus, **kw):
    kw.setdefault("stop_words", None)
    return SklearnTfidf(input_col="text", output_col="features", **kw).fit(corpus)


def test_idf_matches_sklearn_formula(corpus):
    model = _fit(corpus)
    # N=3; df: apple 1, banana 2, cherry 2, durian 1
    expect = {
        "apple": math.log(4 / 2) + 1,
        "banana": math.log(4 / 3) + 1,
        "cherry": math.log(4 / 3) + 1,
        "durian": math.log(4 / 2) + 1,
    }
    vocab = model.vocabulary_
    assert sorted(vocab) == sorted(expect)
    # alphabetical index order, like sklearn's vocabulary_
    assert vocab == {"apple": 0, "banana": 1, "cherry": 2, "durian": 3}
    for term, idx in vocab.items():
        assert model.idf_[idx] == pytest.approx(expect[term], abs=1e-9)


def test_transform_l2_normalized_tfidf(corpus):
    model = _fit(corpus)
    rows = {r["text"]: r["features"] for r in model.transform(corpus).collect()}
    v = rows["apple banana apple"].toArray()
    raw = [2 * (math.log(2) + 1), 1 * (math.log(4 / 3) + 1), 0.0, 0.0]
    norm = math.sqrt(sum(x * x for x in raw))
    for i in range(4):
        assert v[i] == pytest.approx(raw[i] / norm, abs=1e-9)
    assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-9)


def test_max_features_ranked_by_corpus_tf(corpus):
    # corpus_tf: cherry 3, apple 2, banana 2, durian 1.
    # top-2 = cherry + (tf tie apple<banana → apple); NOT by doc
    # frequency, which would prefer banana (df 2) over apple (df 1).
    model = _fit(corpus, max_features=2)
    assert model.vocabulary_ == {"apple": 0, "cherry": 1}


def test_stop_words_and_short_tokens_dropped(spark):
    df = spark.createDataFrame([("The cat and a dog sat",)], ["text"])
    model = SklearnTfidf(input_col="text", stop_words="english").fit(df)
    vocab = set(model.vocabulary_)
    assert "the" not in vocab and "and" not in vocab  # stop words
    assert "a" not in vocab  # sklearn token pattern needs >=2 chars
    assert {"cat", "dog", "sat"} <= vocab


def test_save_load_roundtrip(corpus, tmp_path):
    model = _fit(corpus)
    path = str(tmp_path / "tfidf")
    model.save(path)
    loaded = SklearnTfidfModel.load(path)
    assert loaded.vocabulary_ == model.vocabulary_
    assert loaded.idf_ == pytest.approx(model.idf_)
    a = model.transform(corpus).collect()
    b = loaded.transform(corpus).collect()
    for ra, rb in zip(a, b):
        assert ra["features"] == rb["features"]


def test_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "text string")
    with pytest.raises(ValueError):
        SklearnTfidf(input_col="text").fit(empty)
