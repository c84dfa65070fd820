"""sklearn-parity TF-IDF as a Spark ML estimator/transformer pair.

The reference vectorizes with
``TfidfVectorizer(max_features=5000, stop_words="english")``
(`/root/reference/src/preprocess.py:40`) and fits/transforms through
``prepare_text`` (`/root/reference/src/utils.py:12-13`) — which also
calls ``.toarray()``, densifying a ~0.1%-sparse matrix into ~4 GB at
100k rows.  That densification is the reference's actual scale
ceiling (SURVEY §4.3); here vectors stay sparse end-to-end.

sklearn semantics reproduced (all public, from the sklearn docs):

* tokenization: lowercase, then ``(?u)\\b\\w\\w+\\b`` (tokens of two
  or more word chars);
* vocabulary: top ``max_features`` terms by **corpus term
  frequency** (total count across all docs — not document
  frequency, which is what Spark's ``CountVectorizer(vocabSize=…)``
  would rank by); index order alphabetical, like sklearn's
  ``vocabulary_``;
* smooth idf: ``idf(t) = ln((1+N)/(1+df(t))) + 1`` — note the ``+1``
  offset that `pyspark.ml.feature.IDF` (``ln((N+1)/(df+1))``) lacks
  (SURVEY §7.5);
* L2 row normalization.

Execution is Spark-first: fitting is two distributed aggregations
(per-doc term counts, then per-term ``(corpus_tf, df)``), and the
fitted transform is a pure-JVM ``PipelineModel`` of
``RegexTokenizer → [StopWordsRemover] → CountVectorizerModel →
ElementwiseProduct(idf) → Normalizer(p=2)`` — no Python in the
transform path, so scoring 100 TB of text never leaves codegen'd
JVM operators.

Known semantic substitution: for ``stop_words="english"`` we use
Spark's built-in english stop-word list
(``StopWordsRemover.loadDefaultStopWords``), not sklearn's 318-word
frozenset (sklearn is not installed here).  The lists overlap heavily
but are not identical; parity is semantic (±0.01 accuracy,
BASELINE.md), not bitwise.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import (
    CountVectorizerModel,
    ElementwiseProduct,
    Normalizer,
    RegexTokenizer,
    StopWordsRemover,
)
from pyspark.ml.linalg import Vectors
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sklearn's default token pattern, with Java's ``(?U)`` standing in
#: for Python's ``(?u)`` so ``\w`` is unicode-aware on the JVM too.
TOKEN_PATTERN = r"(?U)\b\w\w+\b"


def _tokenizer_stages(
    input_col: str, stop_words: str | Sequence[str] | None
) -> tuple[list, str]:
    """Tokenize(+stop-filter) stages shared by fit and transform.

    Returns the stage list and the name of the final token column.
    """
    stages: list = [
        RegexTokenizer(
            inputCol=input_col,
            outputCol="__tokens_raw",
            pattern=TOKEN_PATTERN,
            gaps=False,  # pattern matches tokens, not separators
            toLowercase=True,
        )
    ]
    token_col = "__tokens_raw"
    if stop_words is not None:
        words = (
            StopWordsRemover.loadDefaultStopWords("english")
            if stop_words == "english"
            else list(stop_words)
        )
        stages.append(
            StopWordsRemover(
                inputCol=token_col, outputCol="__tokens", stopWords=words
            )
        )
        token_col = "__tokens"
    return stages, token_col


class SklearnTfidfModel:
    """Fitted TF-IDF transformer (the sklearn ``TfidfVectorizer``
    after ``fit``): a thin wrapper over a pure-JVM ``PipelineModel``.

    ``vocabulary_`` / ``idf_`` mirror the sklearn attribute names.
    """

    def __init__(self, pipeline_model: PipelineModel) -> None:
        self._pm = pipeline_model

    # -- sklearn-style fitted attributes --------------------------------
    @property
    def vocabulary_(self) -> dict[str, int]:
        cvm = next(
            s for s in self._pm.stages if isinstance(s, CountVectorizerModel)
        )
        return {t: i for i, t in enumerate(cvm.vocabulary)}

    @property
    def idf_(self) -> list[float]:
        ewp = next(
            s for s in self._pm.stages if isinstance(s, ElementwiseProduct)
        )
        return list(ewp.getScalingVec().toArray())

    @property
    def output_col(self) -> str:
        return self._pm.stages[-1].getOutputCol()

    def transform(self, df: DataFrame) -> DataFrame:
        """L2-normalized TF-IDF ``SparseVector`` column; intermediate
        token/count columns are dropped."""
        out = self._pm.transform(df)
        return out.drop("__tokens_raw", "__tokens", "__counts", "__tfidf_raw")

    # -- persistence (S4) ----------------------------------------------
    def save(self, path: str) -> None:
        """Parquet+JSON ML persistence — the durable, cluster-readable
        replacement for the reference's ``pickle.dump(vectorizer)``
        (`/root/reference/src/preprocess.py:70-71`)."""
        self._pm.write().overwrite().save(path)

    @classmethod
    def load(cls, path: str) -> "SklearnTfidfModel":
        return cls(PipelineModel.load(path))


class SklearnTfidf:
    """TF-IDF estimator with sklearn ``TfidfVectorizer`` semantics
    (`/root/reference/src/preprocess.py:40`, `src/utils.py:12-13`).

    Fit plan (all distributed, shuffle-light):

    1. tokenize + stop-filter (map-only, codegen);
    2. corpus term frequency: ``explode(tokens)`` →
       ``groupBy(term).count()`` — partial aggregation map-side;
    3. document frequency: ``explode(array_distinct(tokens))`` →
       ``groupBy(term).count()``, joined with (2) on term — both
       sides shuffle one row per term, never document bodies;
    4. top-``max_features`` by ``(corpus_tf desc, term asc)`` —
       ``TakeOrderedAndProject``, no global sort.

    The only driver-side materialization is the fitted parameter set
    itself — ≤ ``max_features`` (term, df) rows, the same bounded
    collect ``pyspark.ml``'s own ``CountVectorizer.fit`` performs.
    """

    def __init__(
        self,
        input_col: str = "text",
        output_col: str = "features",
        max_features: int = 5000,
        stop_words: str | Sequence[str] | None = "english",
    ) -> None:
        if max_features < 1:
            raise ValueError("max_features must be >= 1")
        self.input_col = input_col
        self.output_col = output_col
        self.max_features = max_features
        self.stop_words = stop_words

    def fit(self, df: DataFrame) -> SklearnTfidfModel:
        tok_stages, token_col = _tokenizer_stages(self.input_col, self.stop_words)
        tokens = Pipeline(stages=tok_stages).fit(df).transform(df)

        n_docs = tokens.count()
        if n_docs == 0:
            raise ValueError("cannot fit TF-IDF on an empty DataFrame")

        # Two term-keyed aggregations (corpus term frequency, document
        # frequency), joined on term — both shuffle one row per term
        # (per distinct doc-term for df), never whole documents.  No
        # doc id needed: per-doc distinctness comes from
        # array_distinct before the explode.
        tf = (
            tokens.select(F.explode(F.col(token_col)).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("corpus_tf"))
        )
        dfreq = (
            tokens.select(
                F.explode(F.array_distinct(F.col(token_col))).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        term_stats = tf.join(dfreq, "term")
        # Fitted-parameter collect: ≤ max_features rows (see class doc).
        top = (
            term_stats.orderBy(F.desc("corpus_tf"), F.asc("term"))
            .limit(self.max_features)
            .collect()
        )
        if not top:
            raise ValueError("corpus produced an empty vocabulary")

        # sklearn assigns indices in alphabetical term order.
        vocab_df = {r["term"]: r["df"] for r in top}
        vocab = sorted(vocab_df)
        idf = [
            math.log((1.0 + n_docs) / (1.0 + vocab_df[t])) + 1.0 for t in vocab
        ]

        stages = list(tok_stages)
        stages.append(
            CountVectorizerModel.from_vocabulary(
                vocab, inputCol=token_col, outputCol="__counts"
            )
        )
        stages.append(
            ElementwiseProduct(
                scalingVec=Vectors.dense(idf),
                inputCol="__counts",
                outputCol="__tfidf_raw",
            )
        )
        stages.append(
            Normalizer(inputCol="__tfidf_raw", outputCol=self.output_col, p=2.0)
        )
        return SklearnTfidfModel(Pipeline(stages=stages).fit(df))
