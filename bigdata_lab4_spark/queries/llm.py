"""L-series — LLM-data-pipeline operators (SURVEY §2.10).

Dedup, near-dup, similarity search, text stats, and embedding math
over `documents` / `embeddings`. Each operator ships two paths:

* an **exact** formulation that the DuckDB oracle can verify at
  sf0.01 (registered with oracle SQL), and
* the **scale** path (MinHash LSH / random-projection LSH) that is
  the one you would run at 100 TB, verified rows-only plus recall
  tests against the exact variant (tests/test_llm.py).

Scale notes: the exact near-dup query is an inverted-index
self-join — candidate pairs only where documents share a token, not
an all-pairs cartesian. That is already the scalable *exact*
algorithm; its worst case (ubiquitous tokens) is exactly what MinHash
banding (l02b) fixes, by making candidate generation frequency-
independent. kNN similarly: brute-force cosine is the oracle
baseline; the LSH bucketed variant is the ANN path.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_lab4_spark.catalog import load_table
from bigdata_lab4_spark.registry import query
from bigdata_lab4_spark.functions.text import tokens_col


@query(
    "l01_exact_dedup",
    oracle="""
        SELECT md5(text) AS text_hash,
               min(doc_id) AS keep_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    doc="L1 exact dedup via content hash — groupBy(md5(text)), keep the "
    "min doc_id per group. Hash-groupBy shuffles 16-byte digests, not "
    "document bodies — the 100 TB-safe exact-dedup shape.",
)
def l01_exact_dedup(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


@query(
    "l01b_distinct_rows",
    oracle="""
        SELECT source, count(*) AS n_rows, count(DISTINCT text) AS n_unique
        FROM documents GROUP BY source
    """,
    doc="L1 dedup accounting per source — duplicate rate per provenance "
    "bucket, the triage view a dedup pipeline starts from.",
)
def l01b_distinct_rows(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_rows"), F.countDistinct("text").alias("n_unique")
    )


@query(
    "l02_jaccard_pairs",
    oracle="""
        WITH tok AS (
            SELECT DISTINCT doc_id,
                   unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != ''))
                       AS token
            FROM documents WHERE doc_id < 200
        ), sizes AS (
            SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
            FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), scored AS (
            SELECT d1, d2,
                   round(common * 1.0 / (sa.sz + sb.sz - common), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = d1
            JOIN sizes sb ON sb.doc_id = d2
        )
        SELECT d1, d2, jaccard FROM scored
        ORDER BY jaccard DESC, d1, d2 LIMIT 20
    """,
    doc="L2 exact n-gram Jaccard near-dup — inverted-index self-join "
    "(pairs only where a token is shared), token-set Jaccard, top-20 most "
    "similar pairs. Rank on the rounded score so cross-engine float drift "
    "cannot reorder the cut. The MinHash-LSH scale path is l02b.",
)
def l02_jaccard_pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tok = d.select("doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("token"))
    # |token set| per doc is size(array_distinct(...)) computed row-wise
    # on the (pruned, filtered) scan — no explode + groupBy shuffle just
    # to count what the row already holds (guide §2.4).
    sizes = d.select(
        "doc_id", F.size(F.array_distinct(tokens_col("text"))).alias("sz")
    )
    a = tok.select(F.col("doc_id").alias("d1"), "token")
    b = tok.select(F.col("doc_id").alias("d2"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("common"))
    )
    scored = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sa"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sb"), "d2")
        .select(
            "d1",
            "d2",
            F.round(
                F.col("common") / (F.col("sa") + F.col("sb") - F.col("common")), 6
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.desc("jaccard"), "d1", "d2").limit(20)


def _lsh_salt_buckets(spark) -> int:
    """Salt fan-out for the banded near-dup self-joins (guide §2.5).

    A hot (band, val) bucket is a single join KEY: AQE skew handling
    splits oversized *partitions*, never one enormous key, so the hot
    minhash/simhash buckets (one bucket held 1,582 docs at sf0.1) would
    serialize their whole probe×build workload onto one reducer of a
    plain shuffled join. Salting splits the key itself: the probe side
    gets a deterministic ``xxhash64(doc_id) & (k-1)`` salt, the build
    side is replicated across all k salt values, and the join key
    becomes (band, val, salt) — every candidate pair still meets
    exactly once (on the probe row's salt), so the pair set is
    provably identical to the unsalted/broadcast join
    (tests/test_minhash_compat.py pins this at sf0.1).

    k multiplies the build side's shuffle bytes (metadata-sized band
    rows, never payloads), so it is a bounded constant — NOT a function
    of cluster size — scaled down only when the session has fewer
    cores than the default. Override per deployment with
    ``spark.bigdata_lab4.lsh.saltBuckets`` (e.g. larger k for a corpus
    with a single catastrophic bucket).

    Always a power of two: the probe salt is ``xxhash64(doc_id) &
    (k-1)`` rather than ``pmod`` because Pmod is a *nullable*
    expression — the equi-join then infers ``isnotnull(salt)``,
    rewrites it through the projection and pushes it below the
    fingerprint exchange, which makes the two self-join branches'
    subtrees differ and silently disables AQE exchange reuse (the
    fingerprint would be computed twice per run; the bitwise form is
    non-nullable, nothing is inferred, and the branches stay
    byte-identical below the band join — observed, not theory).
    """
    v = spark.conf.get("spark.bigdata_lab4.lsh.saltBuckets", "")
    k = max(1, int(v)) if v else max(4, min(16, spark.sparkContext.defaultParallelism))
    while k & (k - 1):  # round down to a power of two
        k &= k - 1
    return k


#: A candidate pair collides in several bands but must be emitted once;
#: keying the emission to the FIRST band whose minhash values agree
#: reproduces ``approxSimilarityJoin``'s pair-``distinct`` without a
#: second shuffle (same trick as l07b). Short-circuits after ~1 array
#: probe on average; all native, codegen'd.
_MINHASH_FIRST_BAND = (
    "(band < 1 OR s1[0] != s2[0]) AND (band < 2 OR s1[1] != s2[1]) AND "
    "(band < 3 OR s1[2] != s2[2]) AND (band < 4 OR s1[3] != s2[3]) AND "
    "(band < 5 OR s1[4] != s2[4]) AND (band < 6 OR s1[5] != s2[5]) AND "
    "(band < 7 OR s1[6] != s2[6])"
)


def minhash_lsh_pairs(spark, sf_dir, threshold: float = 0.6, salt_buckets: int | None = None):
    """Full (un-truncated) MinHash-LSH candidate pair set — the
    helper both the registered query (top-50 view below) and the
    recall tests (tests/test_llm.py) build on.

    Pair-for-pair identical to the previous
    ``MinHashLSHModel.approxSimilarityJoin(feats, feats, threshold)``
    formulation (same seeded signatures, same banded candidate set,
    same strict ``< threshold`` on the same Jaccard doubles — proven by
    tests/test_minhash_compat.py), but ~200× faster at sf0.1: the ML
    implementation evaluated its ``keyDistance`` UDF per candidate-pair
    *occurrence* (pre-``distinct``, so up to 8× per pair), boxing both
    2^18-dim sparse vectors into Sets each time, on ONE task (the
    1-file scan side of a broadcast join is never re-partitioned).
    Here the per-document fingerprint is computed once, Arrow-batched
    (functions/minhash.py); candidates come from a SALTED shuffled
    equi-join on (band, minhash value, salt) — parallel, hot buckets
    split across salts, no O(corpus) broadcast — with first-band dedup
    and the index-set Jaccard fused in as native expressions, so only
    true result pairs materialize."""
    from bigdata_lab4_spark.functions.minhash import minhash_fingerprint_udf

    minhash_fingerprint = minhash_fingerprint_udf()
    d = load_table(spark, sf_dir, "documents")
    # NOTE no filter on the UDF output: a filter referencing a
    # UDF-computed column makes the optimizer evaluate the UDF twice —
    # once below the pushed filter, once in the projection (guide §4.4;
    # observed as 2 ArrowEvalPython nodes per join branch). Zero-token
    # documents need no explicit filter anyway: their empty ``sig``
    # yields no rows at the posexplode, so they can never join —
    # mirroring MinHashLSH's rejection of empty vectors.
    # Explicit isnotnull(doc_id): the d1<d2 pair filter makes the join
    # infer exactly this predicate on the two band branches; stating it
    # on the SHARED subtree keeps the dictionary branch's scan
    # byte-identical to theirs, so all three consumers resolve to ONE
    # ReusedExchange (null doc_ids can never appear in a pair anyway).
    fp = d.filter(F.col("doc_id").isNotNull()).select(
        "doc_id", minhash_fingerprint(tokens_col("text")).alias("f")
    ).select(
        "doc_id",
        F.col("f.idx").alias("idx"),
        # Minhash values are ((1+e)·a + b) mod 2038074743 < 2^31, so the
        # int cast is lossless; it halves the signature bytes on every
        # band row — including the salt-replicated build side (§2.3
        # "narrower types"). Join equality and the first-band compares
        # see the same values as int32.
        F.col("f.sig").cast("array<int>").alias("sig"),
    )
    # The corpus arrives as few large files (sf0.1: ONE row-group →
    # one partition), and every plan downstream of a 1-partition scan
    # runs on one task — including the O(candidate-pairs) join probe,
    # which is exactly how approxSimilarityJoin ended up single-task
    # for 8 minutes. Spreading the *fingerprints* (≈200 B/doc — never
    # the document bodies, guide §2.3/§8) across the session's
    # parallelism bounds the probe work per task. Explicit N, not AQE:
    # coalescing is byte-based and cannot see that 10 MB of band rows
    # explodes into ~25M joined candidates downstream.
    fp = fp.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    # posexplode_OUTER on purpose: the non-outer generator makes the
    # optimizer infer a ``size(sig) > 0`` filter and push it below the
    # exchange — a filter referencing the UDF column, which re-triggers
    # the §4.4 double evaluation this function just avoided. The outer
    # variant infers nothing; an empty-sig document contributes one
    # null (band, val) row that can never match the equi-join.
    # r22: 64-bit SET MASKS for the per-pair verify (guide §1.2 "make
    # the per-task work cheap once the shape is right"). The verify is
    # |A∩B|/|A∪B| over HashingTF index sets; measured at sf0.1 the
    # O(|A|+|B|) ``array_intersect`` per candidate pair was ~4.7 s of
    # the 6.5 s total (12.35 M pairs — this corpus's 31-token
    # vocabulary makes LSH non-selective). When the GLOBAL index
    # dictionary fits 64 bits, each doc's index set becomes one BIGINT
    # and the intersection one codegen'd ``bit_count(m1 & m2)`` —
    # identical integers, hence bit-identical Jaccard doubles. The
    # dictionary probe is BOUNDED at any scale: the 65 smallest
    # distinct indices via distinct + TakeOrdered (never an unbounded
    # collect); 65 rows ⇒ vocabulary > 64 ⇒ masks stay null and the
    # exact array path runs unchanged (pinned by
    # tests/test_minhash_compat.py::test_mask_fallback_above_64_vocab).
    # As a bonus the replicated build side of the salted join below
    # ships an 8-byte mask instead of the index array.
    # explode_OUTER + nulls-last, not explode: the non-outer generator
    # infers size(idx)>0 / isnotnull(idx) filters that push below the
    # fingerprint exchange, making this subtree differ from the band
    # branches' and silently disabling the exchange reuse that keeps
    # the Arrow fingerprint pass single-evaluated. The one null row an
    # empty corpus contributes sorts last, so it can only occupy a
    # limit slot when fewer than 65 distinct indices exist — and
    # collect_list drops it — so the dictionary stays complete exactly
    # when it is trusted.
    # The when() is a value-level no-op (doc_id is non-null by the fp
    # filter, sig is never null from the UDF) whose only job is to
    # REFERENCE doc_id and sig: column pruning otherwise narrows this
    # branch's copy of the fingerprint exchange to [idx], the subtree
    # stops being byte-identical to the band branches', and the
    # exchange is materialized twice — i.e. the Arrow fingerprint pass
    # runs again just to list distinct indices.
    vocab = (
        fp.select(
            F.explode_outer(
                F.when(
                    F.col("doc_id").isNotNull() & F.col("sig").isNotNull(),
                    F.col("idx"),
                )
            ).alias("i")
        )
        .distinct()
        .orderBy(F.col("i").asc_nulls_last())
        .limit(65)
        .agg(F.sort_array(F.collect_list("i")).alias("dict"))
    )
    enc = fp.crossJoin(F.broadcast(vocab)).select(
        "doc_id",
        # coalesce ⇒ non-nullable: the threshold predicate is
        # null-intolerant in nset, so a nullable nset makes the join
        # infer isnotnull(nset), rewrite it to isnotnull(size(idx))
        # through this projection and push it below the fingerprint
        # exchange — which both re-evaluates the UDF per branch
        # (guide §4.4) and breaks branch-subtree equality (no reuse).
        # The UDF never returns a null idx, so the 0 is unreachable.
        F.coalesce(F.size("idx"), F.lit(0)).alias("nset"),
        F.when(
            F.size("dict") <= 64,
            F.expr(
                "aggregate(idx, CAST(0 AS BIGINT), (m, i) -> m |"
                " shiftleft(CAST(1 AS BIGINT),"
                " CAST(array_position(dict, i) AS INT) - 1))"
            ),
        ).alias("mask"),
        F.when(F.size("dict") > 64, F.col("idx")).alias("idx"),
        "sig",
    )
    bands = enc.select(
        "doc_id", "nset", "mask", "idx", "sig",
        F.posexplode_outer("sig").alias("band", "val"),
    )
    a = bands.select(
        F.col("doc_id").alias("d1"),
        F.col("nset").alias("n1"),
        F.col("mask").alias("m1"),
        F.col("idx").alias("i1"),
        F.col("sig").alias("s1"),
        "band",
        "val",
    )
    b = bands.select(
        F.col("doc_id").alias("d2"),
        F.col("nset").alias("n2"),
        F.col("mask").alias("m2"),
        F.col("idx").alias("i2"),
        F.col("sig").alias("s2"),
        "band",
        "val",
    )
    # |A∩B| / |A∪B| over HashingTF index sets — exactly
    # MinHashLSHModel.keyDistance (intersection/union sizes as doubles,
    # 1 - i/u), exact integers so the doubles are bit-identical —
    # popcount over the masks when the dictionary fits, the original
    # array intersection otherwise (lazy CASE branch, never both).
    inter = (
        F.when(
            F.col("m1").isNull(), F.size(F.array_intersect("i1", "i2"))
        )
        .otherwise(F.bit_count(F.col("m1").bitwiseAND(F.col("m2"))))
        .cast("double")
    )
    union = F.col("n1") + F.col("n2") - inter
    # SALTED SHUFFLED band join (r22, guide §2.5/§3.1). The r21 form
    # broadcast the full corpus band table — fine at sf0.1, an
    # O(corpus) driver/executor OOM at cluster scale. A *plain*
    # shuffled join is no answer either: it partitions by the skewed
    # (band, val) key and one hot minhash bucket is a single key AQE
    # cannot split (observed: leaving the strategy to AQE's estimates
    # of a Python-UDF subtree flipped runs between ~4 s and ~50 s).
    # Salting fixes the key itself — see _lsh_salt_buckets — and the
    # SHUFFLE_HASH hint on the probe side (the k× smaller side of
    # every (band, val, salt) partition) pins the build side and stops
    # AQE from converting the join back to an unbounded broadcast.
    # Both branches still hang below the ONE doc_id exchange above, so
    # at runtime the Arrow fingerprint pass executes once and the
    # second branch reads a ReusedExchange (pinned by
    # tests/test_plans.py::
    # test_lsh_band_joins_runtime_single_fingerprint_pass).
    # salt_buckets=0/1 keeps the legacy broadcast join — used only by
    # the equivalence test to prove the pair sets identical at sf0.1.
    n_salt = _lsh_salt_buckets(spark) if salt_buckets is None else int(salt_buckets)
    if n_salt >= 2:
        a = a.withColumn(
            "salt", F.xxhash64("d1").bitwiseAND(F.lit(n_salt - 1)).cast("int")
        )
        b = b.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
        # Explicit join-key repartition at the session's parallelism:
        # AQE's byte-based partition coalescing sees only the few MB of
        # fingerprint metadata crossing this exchange, not the
        # millions of candidate probes generated downstream of it, and
        # merges the pair-verify stage onto a handful of cores
        # (measured: ~2x slower at sf0.1). REPARTITION_BY_NUM
        # exchanges are exempt from coalescing; the width still
        # derives from defaultParallelism, never a constant.
        par = spark.sparkContext.defaultParallelism
        a = a.repartition(par, "band", "val", "salt")
        b = b.repartition(par, "band", "val", "salt")
        joined = a.hint("shuffle_hash").join(b, ["band", "val", "salt"])
    else:
        joined = a.join(F.broadcast(b), ["band", "val"])
    scored = (
        joined
        .filter(F.col("d1") < F.col("d2"))
        .filter(F.expr(_MINHASH_FIRST_BAND))
        .select(
            "d1",
            "d2",
            (F.lit(1.0) - inter / union).alias("jaccard_dist"),
            # Pushdown barrier (guide §4.4's duplication trap, native
            # flavor): without it the threshold filter is pushed below
            # this projection and the O(|A|+|B|) array_intersect runs
            # TWICE per candidate — once for the filter, once for the
            # rounded output (no cross-operator CSE). One unused
            # non-deterministic column keeps the filter above, so the
            # intersection is evaluated exactly once per pair
            # (measured 11.8 s → 7.4 s at sf0.1).
            F.monotonically_increasing_id().alias("_no_pushdown"),
        )
    )
    return (
        scored.filter(F.col("jaccard_dist") < threshold)
        .select("d1", "d2", F.round("jaccard_dist", 6).alias("jaccard_dist"))
    )


@query(
    "l02b_minhash_lsh",
    oracle=None,  # LSH candidate set is seed/implementation-specific
    doc="L2 MinHash-LSH near-dup, the 100 TB path: tokens → HashingTF "
    "index set → seeded 8-band minhash signature → banded candidate "
    "join → exact index-set Jaccard verify. Bit-compatible with "
    "HashingTF+MinHashLSH(seed=42).approxSimilarityJoin (pinned by "
    "tests/test_minhash_compat.py) but computed natively — see "
    "minhash_lsh_pairs. Candidate generation is banded hashing "
    "(frequency-independent), verified by recall against "
    "l02_jaccard_pairs in tests/test_llm.py.",
)
def l02b_minhash_lsh(spark, sf_dir):
    return (
        minhash_lsh_pairs(spark, sf_dir)
        .orderBy("jaccard_dist", "d1", "d2")
        .limit(50)
    )


@query(
    "l03_knn_exact",
    oracle="""
        WITH q AS (
            SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5
        ), pairs AS (
            SELECT qid, vec_id AS cid,
                   round(
                     list_sum(list_transform(list_zip(qe, embedding),
                              s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     6) AS cosine
            FROM q, embeddings WHERE vec_id != qid
        ), ranked AS (
            SELECT qid, cid, cosine,
                   row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn
            FROM pairs
        )
        SELECT qid, cid, cosine, rn FROM ranked WHERE rn <= 10
    """,
    doc="L3 exact kNN — brute-force cosine top-10 for 5 query vectors: "
    "broadcast the (tiny) query side against the sharded corpus, per-query "
    "row_number on the ROUNDED cosine (deterministic under float drift). "
    "Dot/norm are Catalyst higher-order functions — no Python. "
    "The ANN scale path is l03b.",
)
def l03_knn_exact(spark, sf_dir):
    from bigdata_lab4_spark.functions.embeddings import dot_col, l2_norm_col

    # Norms factored out of the per-pair expression (guide §1.2 step 2:
    # per-task work): each corpus norm is computed once per ROW instead
    # of once per (query, row) pair, and each query norm once instead of
    # N times — the per-pair work drops from 3 array folds to 1 (the
    # dot). Same doubles, same op order ⇒ bit-identical rounded cosine.
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "enorm", l2_norm_col("embedding")
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("enorm").alias("qnorm"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            F.round(
                dot_col("qe", "embedding") / (F.col("qnorm") * F.col("enorm")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "cid")
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)


def _brp_unit_vectors(model):
    """The fitted ``BucketedRandomProjectionLSHModel``'s seeded random
    unit vectors as plain Python lists (numHashTables × dim doubles —
    bounded at any corpus size), or ``None`` when the session exposes
    no py4j bridge (Spark Connect). ``randUnitVectors`` is a
    ``private[ml]`` accessor, which compiles to a public method, so the
    classic-session bridge can call it; the ``None`` path keeps the
    ``model.transform`` pipeline (same rows — tests/test_llm.py)."""
    try:
        juvs = model._java_obj.randUnitVectors()
        return [list(juvs[i].toArray()) for i in range(len(juvs))]
    except Exception:
        return None


@query(
    "l03b_ann_lsh",
    oracle=None,  # bucketed-random-projection candidates are seed-specific
    doc="L3 ANN via BucketedRandomProjectionLSH(seed=42) — the IVF/LSH-style "
    "scale path: hash both sides into buckets, join within buckets only. "
    "Recall vs l03_knn_exact is asserted in tests/test_llm.py.",
)
def l03b_ann_lsh(spark, sf_dir):
    # r21: same seeded model, same buckets, same distances — but the
    # candidate join and the euclidean verify are native expressions
    # instead of approxSimilarityJoin's per-pair-occurrence Scala UDF +
    # distinct over full vector rows (the pattern that cost l02b 8
    # minutes; here the 5-row query side bounds the damage locally,
    # but the shape still shuffled candidate pairs carrying BOTH
    # vectors and verified before dedup). sqrt(Σ(x−y)²) as a
    # sequential zip_with/aggregate fold reproduces Vectors.sqdist's
    # loop order exactly (proven by full-pair equality vs the replaced
    # implementation at sf0.001/0.01/0.1 before committing). Pair
    # dedup across the 4 hash tables is the same first-collision-table
    # filter l02b/l07b use — no distinct shuffle.
    #
    # r22: the hashes themselves go native too — the last per-row JVM
    # UDF chain (array_to_vector → LSHModel.transform →
    # vector_to_array) is gone from the hot path (guide §4.1). The
    # seeded model's hash is floor(dot(v, u_t) / bucketLength) over
    # numHashTables random unit vectors that depend only on
    # (seed, input dim): fit() reads nothing but one row's dimension,
    # so the vectors are extracted once on the driver (4 × dim
    # doubles — bounded at ANY corpus size) and embedded as literals.
    # The sequential zip_with/aggregate dot fold lands on the same
    # doubles as the JVM's gemv accumulation, and floor() on the same
    # bucket ids — pinned value-for-value against model.transform at
    # sf0.001/0.01/0.1 (tests/test_llm.py::
    # test_ann_lsh_native_hashes_match_model_transform), so buckets,
    # candidate set and distances are bit-identical to the r21 form.
    # Sessions without a py4j bridge (Spark Connect) keep the
    # model.transform path — same rows by the same test.
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    bucket_length = 2.0
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    lsh = BucketedRandomProjectionLSH(
        inputCol="vec",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=4,
        seed=42,
    )
    model = lsh.fit(
        e.limit(1).select(array_to_vector("embedding").alias("vec"))
    )
    unit_vectors = _brp_unit_vectors(model)

    if unit_vectors is not None:
        sig = e.select(
            "vec_id",
            "embedding",
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
                        / F.lit(bucket_length)
                    ).cast("double")
                    for uv in unit_vectors
                ]
            ).alias("sig"),
        )
    else:
        from pyspark.ml.functions import vector_to_array

        sig = model.transform(
            e.withColumn("vec", array_to_vector("embedding"))
        ).select(
            "vec_id",
            "embedding",
            F.transform("hashes", lambda v: vector_to_array(v)[0]).alias("sig"),
        )
    bands = sig.select(
        "vec_id", "embedding", "sig",
        F.posexplode_outer("sig").alias("tbl", "bucket"),
    )
    corpus = bands.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("sig").alias("cs"),
        "tbl",
        "bucket",
    )
    queries = bands.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("sig").alias("qs"),
        "tbl",
        "bucket",
    )
    dist = F.sqrt(
        F.expr(
            "aggregate(zip_with(ce, qe, (x, y) ->"
            " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
            " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
            " 0D, (s, v) -> s + v)"
        )
    )
    return (
        corpus.join(F.broadcast(queries), ["tbl", "bucket"])
        .filter(F.col("cid") != F.col("qid"))
        .filter(
            F.expr(
                "(tbl < 1 OR cs[0] != qs[0]) AND (tbl < 2 OR cs[1] != qs[1])"
                " AND (tbl < 3 OR cs[2] != qs[2])"
            )
        )
        .withColumn("dist", dist)
        .filter(F.col("dist") < 4.0)
        .select("qid", "cid", F.round("dist", 6).alias("dist"))
        .orderBy("qid", "dist", "cid")
    )


#: Per-row cosine against every codebook cell, rounded to 6dp so the
#: argmax/probe decisions are bit-stable across engines (same guard as
#: l03's ranking). Norms are NOT recomputed here: ``enorm`` is a
#: per-row column (one fold per row, not per cell) and ``c.cnorm``
#: ships inside the broadcast codebook — per cell the interpreted
#: higher-order work is just the dot fold (guide §1.2 per-task work).
#: sqrt(Σx²) is computed by the same ops as before ⇒ identical doubles.
_IVF_CELL_SCORES = """
    transform(codebook, c -> struct(
        round(
            aggregate(zip_with(embedding, c.cvec,
                      (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                      0D, (s, x) -> s + x)
            / (enorm * c.cnorm),
            6) AS cos,
        c.cell_id AS cell_id))
"""


@query(
    "l03c_ivf_ann",
    oracle="""
        WITH seeds AS (
            SELECT vec_id AS cell_id, embedding AS cvec
            FROM embeddings WHERE vec_id < 8
        ), scores AS (
            SELECT e.vec_id, s.cell_id,
                   round(
                     list_sum(list_transform(list_zip(e.embedding, s.cvec),
                              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(e.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(s.cvec,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     6) AS cos
            FROM embeddings e, seeds s
        ), assigned AS (
            SELECT vec_id, cell_id AS cell FROM (
                SELECT vec_id, cell_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cos DESC, cell_id) AS rn
                FROM scores) WHERE rn = 1
        ), probes AS (
            SELECT vec_id AS qid, cell_id AS cell FROM (
                SELECT vec_id, cell_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cos DESC, cell_id) AS rn
                FROM scores WHERE vec_id < 5) WHERE rn <= 3
        ), cand AS (
            SELECT p.qid, a.vec_id AS cid
            FROM probes p JOIN assigned a ON p.cell = a.cell
            WHERE a.vec_id != p.qid
        ), pairs AS (
            SELECT c.qid, c.cid,
                   round(
                     list_sum(list_transform(list_zip(q.embedding, t.embedding),
                              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(q.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(t.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     6) AS cosine
            FROM cand c
            JOIN embeddings q ON q.vec_id = c.qid
            JOIN embeddings t ON t.vec_id = c.cid
        )
        SELECT qid, cid, cosine, rn FROM (
            SELECT qid, cid, cosine,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, cid) AS rn
            FROM pairs) WHERE rn <= 10
    """,
    doc="L3c IVF-style ANN — the third similarity-search path next to "
    "brute-force (l03) and random-projection LSH (l03b). Coarse "
    "quantizer: a deterministic 8-cell codebook (the 8 lowest vec_ids; "
    "production would train it with KMeans — the probing plumbing is "
    "identical) broadcast as ONE collect_list row, so cell assignment "
    "is a map-only pass over the corpus: no shuffle, no Python, the "
    "argmax runs as array_max over codegen'd higher-order cosines. "
    "Queries probe their 3 nearest cells; exact cosine runs only "
    "within probed cells (candidates ≈ nprobe/K of the corpus). At "
    "100 TB the assigned corpus would be written partitioned by cell "
    "so each probe prunes to 3 partitions. Deterministic end-to-end "
    "(rounded scores + cell_id tie-breaks), hence fully hash-checked "
    "vs DuckDB — unlike seed-dependent l03b. Recall vs l03 is pinned "
    "in tests/test_llm.py.",
)
def l03c_ivf_ann(spark, sf_dir):
    from bigdata_lab4_spark.functions.embeddings import dot_col, l2_norm_col

    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "enorm", l2_norm_col("embedding")
    )
    codebook = (
        e.filter(F.col("vec_id") < 8)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("vec_id").alias("cell_id"),
                        F.col("embedding").alias("cvec"),
                        F.col("enorm").alias("cnorm"),
                    )
                )
            ).alias("codebook")
        )
    )
    scored = e.crossJoin(F.broadcast(codebook)).withColumn(
        "cell_scores", F.expr(_IVF_CELL_SCORES)
    )
    # argmax cell per vector: max on (cos, -cell_id) ⇒ highest cosine,
    # smallest cell_id on ties — mirrors the oracle's row_number order.
    assigned = scored.select(
        "vec_id",
        "embedding",
        "enorm",
        F.expr(
            "-array_max(transform(cell_scores,"
            " s -> struct(s.cos AS cos, -s.cell_id AS nid))).nid"
        ).alias("cell"),
    )
    probes = scored.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("enorm").alias("qnorm"),
        F.explode(
            F.expr(
                "transform(slice(reverse(array_sort(transform(cell_scores,"
                " s -> struct(s.cos AS cos, -s.cell_id AS nid)))), 1, 3),"
                " s -> -s.nid)"
            )
        ).alias("cell"),
    )
    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            F.round(
                dot_col("qe", "embedding") / (F.col("qnorm") * F.col("enorm")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "cid")
    return cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)


@query(
    "l04_text_stats",
    oracle="""
        SELECT doc_id,
               length(text) AS text_len,
               len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != ''))
                   AS n_tokens,
               round(length(replace(text, ' ', '')) * 1.0 /
                     len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')), 4)
                   AS avg_token_len,
               lang
        FROM documents
        WHERE lang = 'en' AND n_chars > 150
    """,
    doc="L4 per-document text stats + language filter — length, token count, "
    "mean token length over the en subset (filters pushed to the scan).",
)
def l04_text_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_col("text")
    return (
        d.filter((F.col("lang") == "en") & (F.col("n_chars") > 150))
        .select(
            "doc_id",
            F.length("text").alias("text_len"),
            F.size(toks).alias("n_tokens"),
            F.round(
                F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / F.size(toks), 4
            ).alias("avg_token_len"),
            "lang",
        )
    )


@query(
    "l06_embedding_math",
    oracle="""
        SELECT label,
               count(*) AS n,
               round(avg(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS avg_norm,
               round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS avg_dim0
        FROM embeddings GROUP BY label
    """,
    doc="L6 embedding math — L2 norms and per-label aggregates via "
    "aggregate/zip_with higher-order functions (SURVEY §2.10 L6).",
)
def l06_embedding_math(spark, sf_dir):
    from bigdata_lab4_spark.functions.embeddings import l2_norm_col

    e = load_table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(l2_norm_col("embedding")), 6).alias("avg_norm"),
        F.round(F.avg(F.element_at("embedding", 1).cast("double")), 6).alias("avg_dim0"),
    )


# -- L7: SimHash near-dup (deterministic LSH — no seed, oracle-able) ----

#: 60-bit SimHash from md5-derived token hashes. md5 is computed
#: identically by Spark and DuckDB (UTF-8 bytes), and 15 hex chars =
#: 60 bits fit a signed BIGINT on both engines, so the whole
#: fingerprint — unlike seeded MinHash (l02b) — is bit-for-bit
#: reproducible in the oracle. All Catalyst higher-order functions,
#: JVM-side.
#:
#: Shape matters (opt guide §1.2 "per-task work"): the token-hash
#: array appears exactly ONCE, and the per-bit majority vote is a
#: single fold over it carrying a 60-counter accumulator. The naive
#: per-bit formulation (transform(sequence(0,59), i -> filter(hs,
#: …))) references ``hs`` twice per bit; higher-order functions are
#: interpreted (no codegen, no common-subexpression elimination), so
#: after CollapseProject inlines ``hs`` the tokenize+md5 work ran
#: ~120× per row — measured 42.7 s for l07b at sf0.1 vs ~1 s for
#: this single-pass form (OPTIMIZATION_r21.md).
def simhash_fingerprints(spark, sf_dir):
    """(doc_id, fp) for every non-null document — shared by l07,
    l07b and the recall tests.

    Bit-identical to the per-bit majority definition (``2*|{h: bit i
    set}| > |hs|`` over the distinct-token md5 hashes), but computed
    as explode → codegen'd hash aggregate: per exploded token hash the
    60 ``(h >> i) & 1`` contributions feed 60 ``sum`` buffers plus a
    ``count``, partially aggregated map-side, so the one shuffle
    carries 61 longs per document (guide §2.3). The previous
    formulation folded a 60-counter struct accumulator over the token
    array with ``aggregate``/``zip_with`` — higher-order lambdas are
    interpreted (no codegen), allocate a fresh 60-element array per
    token, and the whole corpus ran on the scan's single partition
    (one row-group file ⇒ one task): 1.0 s at sf0.1 vs ~0.15 s for
    this shape, and the aggregate leaves the fingerprints
    hash-distributed across the session's shuffle partitions — which
    downstream l07b needs anyway for a parallel candidate join.
    ``explode_outer`` + ``count(h)`` keep zero-token documents in the
    result with fp = 0, exactly as the fold produced."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    h = (
        d.select(
            "doc_id",
            F.explode_outer(
                F.expr("array_distinct(filter(split(text, '\\\\s+'), t -> t != ''))")
            ).alias("tok"),
        )
        .select(
            "doc_id",
            F.expr(
                "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h"),
        )
    )
    counted = h.groupBy("doc_id").agg(
        F.count("h").alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))).alias(f"c{i}")
            for i in range(60)
        ],
    )
    fp_expr = " + ".join(
        f"IF(2 * coalesce(c{i}, CAST(0 AS BIGINT)) > n, "
        f"shiftleft(CAST(1 AS BIGINT), {i}), CAST(0 AS BIGINT))"
        for i in range(60)
    )
    return counted.select("doc_id", F.expr(fp_expr).alias("fp"))


_SIMHASH_ORACLE_FP = """
        SELECT doc_id,
               CAST(coalesce(list_sum(list_transform(range(0, 60), i ->
                   CASE WHEN 2 * len(list_filter(hs, h -> (h >> i) & 1 = 1)) > len(hs)
                        THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)), 0)
                    AS BIGINT) AS fp
        FROM (
            SELECT doc_id,
                   list_transform(
                       list_distinct(list_filter(regexp_split_to_array(text, '\\s+'),
                                                 t -> t != '')),
                       t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs
            FROM documents WHERE text IS NOT NULL
        )
"""


@query(
    "l07_simhash",
    oracle=_SIMHASH_ORACLE_FP,
    doc="L2/SimHash fingerprints — 60-bit per-doc signature via per-bit "
    "token-hash majority vote. Map-only (no shuffle); deterministic, so "
    "bit-for-bit oracle-checked, unlike seeded MinHash.",
)
def l07_simhash(spark, sf_dir):
    return simhash_fingerprints(spark, sf_dir)


@query(
    "l07b_simhash_neardup",
    oracle="""
        WITH fp AS ({fp_sql}),
        bands AS (
            SELECT doc_id, fp, r.range AS band,
                   (fp >> (15 * CAST(r.range AS INTEGER))) & 32767 AS val
            FROM fp CROSS JOIN range(0, 4) r
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS d1, a.fp AS fp1,
                            b.doc_id AS d2, b.fp AS fp2
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
        )
        SELECT d1, d2, bit_count(xor(fp1, fp2)) AS hamming
        FROM cand
        WHERE bit_count(xor(fp1, fp2)) <= 6
        ORDER BY hamming, d1, d2
    """.format(fp_sql=_SIMHASH_ORACLE_FP),
    doc="L2/SimHash banded near-dup join — 4 bands × 15 bits: candidate "
    "pairs only where a band collides (inverted-index join on (band, "
    "value), never all-pairs), then exact Hamming verify ≤ 6. Fully "
    "deterministic LSH, so the oracle checks the complete pipeline.",
)
def l07b_simhash_neardup(spark, sf_dir):
    return simhash_neardup_pairs(spark, sf_dir)


def simhash_neardup_pairs(spark, sf_dir, salt_buckets: int | None = None):
    # Banded candidate JOIN on (band, val): 4 band rows of 16 bytes per
    # document — keys and metadata, never payloads (guide §2.3, §8).
    # The Hamming ≤ 6 verify and the first-band dedup (a pair is
    # emitted only from the FIRST band the two fingerprints collide
    # in — replaces a pair-distinct shuffle) run as join residual
    # conditions: codegen'd bit ops, evaluated per probe match, so
    # only final result pairs materialize. The previous formulation
    # collected each bucket with collect_list and generated the upper
    # triangle inside an interpreted higher-order lambda — the hottest
    # (band, val) bucket at sf0.1 held 1 582 docs ⇒ 1.25 M pairs
    # generated single-threaded inside ONE row (a straggler AQE cannot
    # split; guide §2.5): 4.1 s vs ~0.8 s for the join, which spreads
    # the same probes across the fingerprint aggregate's partitioning.
    fp = simhash_fingerprints(spark, sf_dir)
    bands = fp.select(
        "doc_id", "fp", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band")
    ).select(
        "doc_id",
        "fp",
        "band",
        F.expr("shiftright(fp, 15 * band) & 32767").alias("val"),
    )
    a = bands.select(
        F.col("doc_id").alias("d1"), F.col("fp").alias("fp1"), "band", "val"
    )
    b = bands.select(
        F.col("doc_id").alias("d2"), F.col("fp").alias("fp2"), "band", "val"
    )
    # SALTED SHUFFLED band join (r22): the r21 broadcast of the whole
    # corpus band table is an O(corpus) OOM at cluster scale, and a
    # plain shuffled join lands each hot (band, val) bucket — a single
    # key, 1,582 docs at sf0.1 — on one reducer AQE cannot split
    # (guide §2.5). Salting splits the key: probe rows carry
    # pmod(xxhash64(d1), k), the build side is replicated over all k
    # salts, every pair meets exactly once, so the candidate set is
    # identical (oracle hash-match + broadcast-vs-salted equality test
    # at sf0.1). SHUFFLE_HASH on the probe side (k× smaller per
    # partition) pins the build side and blocks AQE's broadcast
    # conversion. The fingerprint aggregate below still computes once:
    # both branches share its exchange (ReusedExchange at runtime).
    # salt_buckets=0/1 keeps the legacy broadcast join for the
    # equivalence test.
    n_salt = _lsh_salt_buckets(spark) if salt_buckets is None else int(salt_buckets)
    if n_salt >= 2:
        a = a.withColumn(
            "salt", F.xxhash64("d1").bitwiseAND(F.lit(n_salt - 1)).cast("int")
        )
        b = b.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
        # Explicit join-key repartition at the session's parallelism:
        # AQE's byte-based partition coalescing sees only the few MB of
        # fingerprint metadata crossing this exchange, not the
        # millions of candidate probes generated downstream of it, and
        # merges the pair-verify stage onto a handful of cores
        # (measured: ~2x slower at sf0.1). REPARTITION_BY_NUM
        # exchanges are exempt from coalescing; the width still
        # derives from defaultParallelism, never a constant.
        par = spark.sparkContext.defaultParallelism
        a = a.repartition(par, "band", "val", "salt")
        b = b.repartition(par, "band", "val", "salt")
        joined = a.hint("shuffle_hash").join(b, ["band", "val", "salt"])
    else:
        joined = a.join(F.broadcast(b), ["band", "val"])
    cand = (
        joined
        .filter(F.col("d1") < F.col("d2"))
        .filter(
            F.expr(
                "bit_count(fp1 ^ fp2) <= 6"
                " AND (band < 1 OR ((fp1 ^ fp2) & 32767) != 0)"
                " AND (band < 2 OR (shiftright(fp1 ^ fp2, 15) & 32767) != 0)"
                " AND (band < 3 OR (shiftright(fp1 ^ fp2, 30) & 32767) != 0)"
            )
        )
    )
    return (
        cand.select(
            "d1",
            "d2",
            F.bit_count(F.col("fp1").bitwiseXOR(F.col("fp2"))).alias("hamming"),
        )
        .orderBy("hamming", "d1", "d2")
    )


@query(
    "l06b_cosine_neardup",
    oracle="""
        WITH v AS (
            SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
        ), pairs AS (
            SELECT a.vec_id AS v1, b.vec_id AS v2,
                   round(
                     list_sum(list_transform(list_zip(a.embedding, b.embedding),
                              s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                     6) AS cosine
            FROM v a JOIN v b ON a.vec_id < b.vec_id
        )
        SELECT v1, v2, cosine FROM pairs
        ORDER BY cosine DESC, v1, v2 LIMIT 20
    """,
    doc="L1/L3 embedding-cosine near-dup — exact top-20 most-similar "
    "pairs on a bounded slice: the oracle baseline for semantic dedup. "
    "Rank on the ROUNDED cosine so float drift cannot reorder the cut. "
    "At 100 TB the all-pairs stage is replaced by LSH bucketing "
    "(l03b's BucketedRandomProjectionLSH: candidates per bucket, then "
    "this exact re-score) — never a full cartesian.",
)
def l06b_cosine_neardup(spark, sf_dir):
    from bigdata_lab4_spark.functions.embeddings import dot_col, l2_norm_col

    # Same norm factoring as l03: O(n) norms precomputed per side, the
    # O(n²) pair expression pays only the dot — bit-identical result.
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .withColumn("nrm", l2_norm_col("embedding"))
    )
    a = e.select(
        F.col("vec_id").alias("v1"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("v2"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(F.broadcast(b), F.col("v1") < F.col("v2")).select(
        "v1",
        "v2",
        F.round(dot_col("ea", "eb") / (F.col("na") * F.col("nb")), 6).alias("cosine"),
    )
    return pairs.orderBy(F.desc("cosine"), "v1", "v2").limit(20)
