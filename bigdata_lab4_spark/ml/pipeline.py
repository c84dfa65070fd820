"""End-to-end sentiment pipeline: clean → TF-IDF → MultinomialNB.

This is the reference's whole job, re-expressed Spark-first:

* cleaning: ``clean_text`` (`/root/reference/src/utils.py:5-10`) —
  here the codegen'd Catalyst expression chain from
  ``functions.text.clean_text_col`` instead of ``pandas.apply``;
* vectorization: ``TfidfVectorizer(max_features=5000,
  stop_words="english")`` (`src/preprocess.py:40`) — here
  :class:`~bigdata_lab4_spark.ml.tfidf.SklearnTfidf`, sparse
  end-to-end;
* estimator: ``MultinomialNB(alpha=1.0, fit_prior=True)``
  (`src/train.py:36-42`) — here
  ``pyspark.ml.classification.NaiveBayes(smoothing=alpha,
  modelType="multinomial")``, mathematically the same estimator
  (per-class feature sums + Laplace ``alpha``; Spark always fits
  class priors from data, which is sklearn's ``fit_prior=True``);
* persistence: Spark ML writers (parquet + JSON metadata) plus an
  **immutable per-run ``run.json``** carrying params/metrics/paths —
  replacing the reference's mutable, race-prone ``config.ini``
  rewritten by every stage (`src/train.py:63-71`, SURVEY §4.3);
* serving: :meth:`SentimentModel.predict_one` mirrors
  ``Predictor.predict`` (`src/predict.py:73-92`) including the
  empty-message guard and the Positive/Negative/Unknown decode — but
  scores driver-local from the fitted parameters (vocab, idf, NB
  log-odds), no Spark job per request.

Scale notes: training is two aggregations (TF-IDF fit) plus Spark
ML's distributed NB sufficient-stats pass; scoring is a pure-JVM
``transform``. Nothing here densifies the feature matrix — the
reference's ``.toarray()`` (`src/utils.py:13`) is exactly what caps
it at 100k rows (SURVEY §4.3).
"""

from __future__ import annotations

import json
import math
import os
import re
import string
from datetime import datetime, timezone

from pyspark.ml.classification import NaiveBayes, NaiveBayesModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_lab4_spark.functions.text import clean_text_col
from bigdata_lab4_spark.ml.tfidf import SklearnTfidf, SklearnTfidfModel

#: Decode map from `/root/reference/src/predict.py:84-92`.
POSITIVE, NEGATIVE, UNKNOWN = (
    "Positive sentiment",
    "Negative sentiment",
    "Unknown sentiment",
)

_CLEAN_URL = re.compile(r"http\S+|www\S+")
_CLEAN_MENTION = re.compile(r"@\w+")
_CLEAN_HASHTAG = re.compile(r"#\w+")
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)
_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")


def _clean_text_py(text: str) -> str:
    """Driver-local twin of ``clean_text_col`` for single-row serving
    (same public regexes as `/root/reference/src/utils.py:5-10`)."""
    text = _CLEAN_URL.sub("", text)
    text = _CLEAN_MENTION.sub("", text)
    text = _CLEAN_HASHTAG.sub("", text)
    return text.translate(_PUNCT_TABLE).lower().strip()


class SentimentModel:
    """Fitted sentiment classifier: TF-IDF model + NB model.

    Batch path (:meth:`transform`) is pure JVM; serving path
    (:meth:`predict_one`) is driver-local numpy-free scoring from the
    same fitted parameters, asserted equal to the batch path in
    ``tests/test_ml_pipeline.py``.
    """

    def __init__(
        self,
        tfidf_model: SklearnTfidfModel,
        nb_model: NaiveBayesModel,
        text_col: str = "text",
        label_col: str = "label",
    ) -> None:
        self.tfidf_model = tfidf_model
        self.nb_model = nb_model
        self.text_col = text_col
        self.label_col = label_col
        self._local = None  # lazy driver-local scoring params

    # -- batch scoring (U4) --------------------------------------------
    def transform(self, df: DataFrame) -> DataFrame:
        """Append ``prediction`` (double) and decoded ``sentiment``
        columns. Input needs ``text_col``; label is not required."""
        cleaned = df.withColumn("__clean", clean_text_col(self.text_col))
        feats = self.tfidf_model.transform(cleaned)
        scored = self.nb_model.transform(feats)
        decoded = scored.withColumn(
            "sentiment",
            F.when(F.col("prediction") == 1.0, POSITIVE)
            .when(F.col("prediction") == 0.0, NEGATIVE)
            .otherwise(UNKNOWN),
        )
        return decoded.drop(
            "__clean", "features", "rawPrediction", "probability"
        )

    def evaluate(self, df: DataFrame) -> dict:
        """Accuracy of the batch path against ``label_col`` — the
        reference's smoke metric (`src/train.py:45-48`). One
        aggregated scalar leaves the cluster."""
        scored = self.transform(df)
        row = scored.agg(
            F.avg(
                (F.col(self.label_col).cast("double") == F.col("prediction"))
                .cast("double")
            ).alias("accuracy"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        return {"accuracy": float(row["accuracy"]), "n": int(row["n"])}

    # -- online scoring (U5) -------------------------------------------
    def _local_params(self):
        """Materialize (once) the driver-side scoring parameters:
        vocab index, idf weights, stop set, NB log-priors ``pi`` and
        log-likelihood matrix ``theta``.  Size is O(classes ×
        max_features) — a few hundred KB, the standard broadcast-model
        serving pattern."""
        if self._local is None:
            stop: frozenset[str] = frozenset()
            for st in self.tfidf_model._pm.stages:
                if hasattr(st, "getStopWords") and st.hasParam("stopWords"):
                    stop = frozenset(st.getStopWords())
            self._local = {
                "vocab": self.tfidf_model.vocabulary_,
                "idf": self.tfidf_model.idf_,
                "stop": stop,
                "pi": list(self.nb_model.pi.toArray()),
                "theta": self.nb_model.theta.toArray().tolist(),
            }
        return self._local

    def predict_one(self, message: str) -> str:
        """Single-message serving — `/root/reference/src/predict.py:73-92`
        semantics: empty-guard, clean, vectorize, NB argmax, decode."""
        if not message:
            raise ValueError(
                "Message is not provided. Please provide a message to analyze."
            )
        p = self._local_params()
        counts: dict[int, int] = {}
        for tok in _TOKEN_RE.findall(_clean_text_py(message).lower()):
            if tok in p["stop"]:
                continue
            idx = p["vocab"].get(tok)
            if idx is not None:
                counts[idx] = counts.get(idx, 0) + 1
        # tf-idf + L2 norm, sparse
        x = {i: c * p["idf"][i] for i, c in counts.items()}
        norm = math.sqrt(sum(v * v for v in x.values()))
        if norm > 0:
            x = {i: v / norm for i, v in x.items()}
        # multinomial NB: argmax_c pi[c] + sum_f x_f * theta[c][f]
        scores = [
            p["pi"][c] + sum(v * p["theta"][c][i] for i, v in x.items())
            for c in range(len(p["pi"]))
        ]
        pred = max(range(len(scores)), key=lambda c: (scores[c], -c))
        if pred == 1:
            return POSITIVE
        if pred == 0:
            return NEGATIVE
        return UNKNOWN  # pragma: no cover — binary models never hit this

    # -- persistence (S4 + S5 run metadata) ----------------------------
    def save(self, path: str, metrics: dict | None = None) -> None:
        """Write ``tfidf/`` + ``nb/`` (Spark ML writers) and an
        immutable ``run.json`` (params, metrics, artifact paths) —
        the append-only replacement for the reference's shared
        ``config.ini`` (`src/train.py:63-71`)."""
        os.makedirs(path, exist_ok=True)
        self.tfidf_model.save(os.path.join(path, "tfidf"))
        self.nb_model.write().overwrite().save(os.path.join(path, "nb"))
        run = {
            "model": "NAIVE_BAYES",
            "params": {
                "alpha": self.nb_model.getSmoothing(),
                "model_type": self.nb_model.getModelType(),
                "max_features": len(self.tfidf_model.idf_),
                "text_col": self.text_col,
                "label_col": self.label_col,
            },
            "metrics": metrics or {},
            "paths": {"tfidf": "tfidf", "nb": "nb"},
            "saved_at": datetime.now(timezone.utc).isoformat(),
        }
        with open(os.path.join(path, "run.json"), "w") as f:
            json.dump(run, f, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "SentimentModel":
        with open(os.path.join(path, "run.json")) as f:
            run = json.load(f)
        return cls(
            SklearnTfidfModel.load(os.path.join(path, run["paths"]["tfidf"])),
            NaiveBayesModel.load(os.path.join(path, run["paths"]["nb"])),
            text_col=run["params"]["text_col"],
            label_col=run["params"]["label_col"],
        )


class SentimentPipeline:
    """Unfitted pipeline with the reference's hyperparameters as
    defaults (`src/preprocess.py:40`, `src/train.py:36`,
    `config.ini` NAIVE_BAYES section)."""

    def __init__(
        self,
        text_col: str = "text",
        label_col: str = "label",
        max_features: int = 5000,
        stop_words: str | None = "english",
        alpha: float = 1.0,
        fit_prior: bool = True,
    ) -> None:
        if not fit_prior:
            # Spark ML NB always estimates class priors from data —
            # sklearn's fit_prior=True, the reference's configured
            # value (`config.ini`, `src/train.py:36`).
            raise ValueError("fit_prior=False is not supported")
        self.text_col = text_col
        self.label_col = label_col
        self.max_features = max_features
        self.stop_words = stop_words
        self.alpha = alpha

    def fit(
        self, train_df: DataFrame, tfidf_fit_df: DataFrame | None = None
    ) -> SentimentModel:
        """Fit TF-IDF then NB.

        ``tfidf_fit_df`` reproduces the reference's leakage quirk on
        demand: it fits the vectorizer on the FULL dataset before the
        train/test split (`src/preprocess.py:50-55`, SURVEY §4.3).
        Pass the full frame there for metric parity; omit it for the
        leak-free mode (vectorizer fit on train only).
        """
        fit_src = tfidf_fit_df if tfidf_fit_df is not None else train_df
        tfidf = SklearnTfidf(
            input_col="__clean",
            output_col="features",
            max_features=self.max_features,
            stop_words=self.stop_words,
        ).fit(fit_src.withColumn("__clean", clean_text_col(self.text_col)))

        train_feats = tfidf.transform(
            train_df.withColumn("__clean", clean_text_col(self.text_col))
        ).withColumn("__label_d", F.col(self.label_col).cast("double"))
        nb = NaiveBayes(
            smoothing=self.alpha,
            modelType="multinomial",
            featuresCol="features",
            labelCol="__label_d",
        ).fit(train_feats)
        return SentimentModel(
            tfidf, nb, text_col=self.text_col, label_col=self.label_col
        )


def train_test_split(
    df: DataFrame, test_size: float = 0.2, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Deterministic split mirroring the reference's
    ``train_test_split(..., test_size=0.2, random_state=42)``
    (`src/preprocess.py:53-55`) — semantic, not bitwise: Spark and
    sklearn RNGs cannot produce identical splits (SURVEY §7.4).
    """
    if not 0.0 < test_size < 1.0:
        raise ValueError("test_size must be in (0, 1)")
    train, test = df.randomSplit([1.0 - test_size, test_size], seed=seed)
    return train, test


def load_tweets_csv(spark: SparkSession, path: str, encoding: str = "ISO-8859-1") -> DataFrame:
    """The reference's ingest: latin-1 CSV with ItemID / Sentiment /
    SentimentText (`src/preprocess.py:46`), normalized to
    (id, label, text)."""
    return (
        spark.read.option("header", True)
        .option("encoding", encoding)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
        .select(
            F.col("ItemID").cast("long").alias("id"),
            F.col("Sentiment").cast("int").alias("label"),
            F.col("SentimentText").cast("string").alias("text"),
        )
    )
