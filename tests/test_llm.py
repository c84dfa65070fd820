"""Recall tests for the LSH scale paths against their exact twins —
the assertions promised in the `l02b` / `l03b` docstrings
(`bigdata_lab4_spark/queries/llm.py`).

The exact variants are driver-verified against DuckDB; these tests
close the remaining gap: that the approximate (100 TB) paths actually
FIND what the exact paths find, not merely run.  Both LSH models are
seeded (seed=42), so the measured recalls are deterministic.
"""

from __future__ import annotations

import pytest

from bigdata_lab4_spark.queries.llm import minhash_lsh_pairs
from bigdata_lab4_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_minhash_lsh_recall_vs_exact_jaccard(spark, queries):
    """MinHash-LSH candidates must cover the exact top-20 Jaccard
    pairs (all exact duplicates at sf0.01, i.e. jaccard == 1.0).
    Identical token sets collide in every hash table, so dist-0 pairs
    are guaranteed candidates — recall on the top pairs should be
    total, and we gate at >= 0.8 as the docstring promises."""
    exact = [
        (r["d1"], r["d2"], r["jaccard"])
        for r in queries["l02_jaccard_pairs"](spark, SF_DIR).collect()
    ]
    assert len(exact) == 20
    cand = {
        (r["d1"], r["d2"])
        for r in minhash_lsh_pairs(spark, SF_DIR).collect()
    }
    hits = sum(1 for d1, d2, _ in exact if (d1, d2) in cand)
    recall = hits / len(exact)
    assert recall >= 0.8
    # the duplicate pairs (jaccard == 1.0) specifically are all found
    dup_pairs = [(d1, d2) for d1, d2, j in exact if j == 1.0]
    assert all(p in cand for p in dup_pairs)


def test_minhash_lsh_registered_view_shape(spark, queries):
    """The registered rows-only query is the deterministic top-50 cut
    of the candidate set (stable under the driver's rows-only check)."""
    rows = queries["l02b_minhash_lsh"](spark, SF_DIR).collect()
    assert len(rows) == 50
    assert all(r["jaccard_dist"] <= 0.6 for r in rows)
    assert all(r["d1"] < r["d2"] for r in rows)


def test_ann_lsh_recall_at_10_vs_exact_knn(spark, queries):
    """BucketedRandomProjectionLSH recall@10 against brute-force
    cosine top-10, per query vector, mean >= 0.8 (measured 0.98 with
    seed=42 at sf0.01)."""
    exact: dict[int, list[int]] = {}
    for r in queries["l03_knn_exact"](spark, SF_DIR).collect():
        exact.setdefault(r["qid"], []).append(r["cid"])
    assert len(exact) == 5 and all(len(v) == 10 for v in exact.values())

    ann: dict[int, list[int]] = {}
    # rows arrive ordered (qid, dist asc, cid) — see l03b's orderBy
    for r in queries["l03b_ann_lsh"](spark, SF_DIR).collect():
        ann.setdefault(r["qid"], []).append(r["cid"])

    recalls = []
    for qid, top10 in exact.items():
        approx10 = set(ann.get(qid, [])[:10])
        recalls.append(len(set(top10) & approx10) / len(top10))
    assert sum(recalls) / len(recalls) >= 0.8


def test_ann_lsh_native_hashes_match_model_transform(spark, queries, monkeypatch):
    """r22: l03b's bucket hashes are native floor(dot/bucketLength)
    expressions over driver-extracted seeded unit vectors (no per-row
    JVM UDF). Pin (a) the native signature value-for-value against
    ``model.transform`` over the whole corpus, and (b) the registered
    query's full output row-for-row against the Connect fallback path
    (which IS the r21 model.transform pipeline)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import functions as F

    import bigdata_lab4_spark.queries.llm as llm
    from bigdata_lab4_spark.catalog import load_table

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding", array_to_vector("embedding").alias("vec")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(e)
    unit_vectors = llm._brp_unit_vectors(model)
    assert unit_vectors is not None and len(unit_vectors) == 4

    ref = model.transform(e).select(
        "vec_id", F.transform("hashes", lambda v: vector_to_array(v)[0]).alias("sig")
    )
    nat = e.select(
        "vec_id",
        F.array(
            *[
                F.floor(
                    F.aggregate(
                        F.zip_with(
                            "embedding",
                            F.array(*[F.lit(x) for x in uv]),
                            lambda x, y: x.cast("double") * y,
                        ),
                        F.lit(0.0),
                        lambda s, v: s + v,
                    )
                    / F.lit(2.0)
                ).cast("double")
                for uv in unit_vectors
            ]
        ).alias("nsig"),
    )
    joined = ref.join(nat, "vec_id")
    assert joined.count() == e.count()
    assert joined.filter(F.expr("sig != nsig")).count() == 0

    native_rows = [tuple(r) for r in queries["l03b_ann_lsh"](spark, SF_DIR).collect()]
    monkeypatch.setattr(llm, "_brp_unit_vectors", lambda m: None)
    fallback_rows = [
        tuple(r) for r in queries["l03b_ann_lsh"](spark, SF_DIR).collect()
    ]
    assert native_rows == fallback_rows


def test_ivf_ann_recall_at_10_vs_exact_knn(spark, queries):
    """IVF (8 deterministic cells, nprobe=3) recall@10 against
    brute-force cosine top-10, per query vector, mean >= 0.8
    (measured 0.94 at sf0.01 — deterministic, no seeds involved)."""
    exact: dict[int, list[int]] = {}
    for r in queries["l03_knn_exact"](spark, SF_DIR).collect():
        exact.setdefault(r["qid"], []).append(r["cid"])
    assert len(exact) == 5 and all(len(v) == 10 for v in exact.values())

    ivf: dict[int, list[tuple[int, int]]] = {}
    for r in queries["l03c_ivf_ann"](spark, SF_DIR).collect():
        ivf.setdefault(r["qid"], []).append((r["rn"], r["cid"]))

    recalls = []
    for qid, top10 in exact.items():
        got10 = {cid for _, cid in sorted(ivf.get(qid, []))[:10]}
        recalls.append(len(set(top10) & got10) / len(top10))
    assert sum(recalls) / len(recalls) >= 0.8
