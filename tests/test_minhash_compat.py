"""Bit-compatibility of the native MinHash-LSH path (functions/minhash.py
+ queries/llm.py::minhash_lsh_pairs) with the Spark ML implementation it
replaced in the r21 optimization round.

The l02b rewrite is only admissible because it is *pair-for-pair
identical* to ``MinHashLSHModel.approxSimilarityJoin``; these tests pin
each layer of that claim:

1. token → HashingTF column index (canonical murmur3_x86_32, seed 42);
2. index set → seeded 8-table minhash signature (embedded seed-42
   coefficients, HASH_PRIME modulus);
3. the full candidate-pair set with Jaccard distances, against the
   real ``approxSimilarityJoin`` at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_lab4_spark.functions.minhash import (
    MINHASH_COEFFS,
    MINHASH_PRIME,
    NUM_FEATURES,
    doc_fingerprint,
    hashing_tf_index,
)
from bigdata_lab4_spark.queries.llm import minhash_lsh_pairs

SF_DIR = "/root/testdata/sf0.001"

TOKENS = ["hello", "world", "a", "ab", "abc", "abcd", "Ünïcode", "€uro", "日本語", ""]


def test_index_matches_hashing_tf(spark):
    """Canonical murmur3 mod 2^18 must equal HashingTF's column index —
    including multi-byte UTF-8 and the aligned/unaligned byte-length
    tails the two murmur variants disagree on."""
    from pyspark.ml.feature import HashingTF

    df = spark.createDataFrame(
        [(i, [t]) for i, t in enumerate(TOKENS)], ["id", "tokens"]
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=NUM_FEATURES)
    rows = tf.transform(df).orderBy("id").collect()
    for row, tok in zip(rows, TOKENS):
        assert row.features.indices.tolist() == [hashing_tf_index(tok)]


def test_signature_matches_minhash_lsh_model(spark):
    """The embedded seed-42 coefficients + HASH_PRIME reproduce
    ``MinHashLSHModel.transform`` exactly."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = spark.createDataFrame(
        [(1, ["hello", "world", "abc"]), (2, ["€uro", "a", "ab", "abcd"]), (3, ["x"])],
        ["id", "tokens"],
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=NUM_FEATURES)
    feats = tf.transform(docs)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    by_id = {r.id: r for r in model.transform(feats).collect()}
    for r in docs.collect():
        _, sig = doc_fingerprint(r.tokens, {})
        spark_sig = [v.toArray().tolist()[0] for v in by_id[r.id].hashes]
        assert [float(s) for s in sig] == spark_sig


def test_signature_formula_constants():
    """min((1+idx)·a + b mod P) over a known index set, by hand."""
    idxs, sig = doc_fingerprint(["hello"], {})
    e = hashing_tf_index("hello")
    assert idxs == [e]
    assert sig == [((1 + e) * a + b) % MINHASH_PRIME for a, b in MINHASH_COEFFS]


def test_pairs_match_approx_similarity_join(spark):
    """Full candidate-pair equality (ids AND rounded distances) against
    the replaced ``approxSimilarityJoin`` formulation at sf0.001."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from bigdata_lab4_spark.catalog import load_table
    from bigdata_lab4_spark.functions.text import tokens_col

    d = load_table(spark, SF_DIR, "documents")
    docs = d.select("doc_id", tokens_col("text").alias("tokens"))
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=NUM_FEATURES)
    feats = tf.transform(docs)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(feats)
    ml_pairs = (
        model.approxSimilarityJoin(feats, feats, 0.6, distCol="jaccard_dist")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("d1"),
            F.col("datasetB.doc_id").alias("d2"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )
    want = {(r.d1, r.d2): r.jaccard_dist for r in ml_pairs.collect()}
    got = {
        (r.d1, r.d2): r.jaccard_dist
        for r in minhash_lsh_pairs(spark, SF_DIR).collect()
    }
    assert want == got
