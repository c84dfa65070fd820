"""L5 — multimodal asset columns (SURVEY §2 L5, LLM-pipeline
mandate).

Two registered queries over the asset representation built by
:mod:`bigdata_lab4_spark.functions.multimodal`:

* ``l05_multimodal_meta`` — metadata-only projection: mime / size /
  source / content digest, no decode. At scale this is the query
  shape that must NOT read payload bytes; with payloads stored as a
  parquet column, Catalyst prunes the column at the scan.
* ``l05b_decode_features`` — the Python hop: ``mapInPandas``
  feature extraction with the (stubbed) decoder. Features are
  deterministic, so even the Python path is hash-checked against
  DuckDB.

The reference has no multimodal surface; these rows come from the
SURVEY §2 L5 mandate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_lab4_spark.catalog import load_table
from bigdata_lab4_spark.functions.multimodal import (
    extract_features,
    with_asset_columns,
)
from bigdata_lab4_spark.registry import query


@query(
    "l05_multimodal_meta",
    oracle="""
        SELECT doc_id,
               'text/plain'                         AS mime,
               octet_length(encode(text))           AS n_bytes,
               source,
               md5(text)                            AS digest
        FROM documents
        WHERE text IS NOT NULL
    """,
    doc="L5 multimodal metadata projection: typed struct fields + "
    "payload digest, no decode — the metadata-only access path that "
    "leaves payload bytes unread at 100 TB.",
)
def l05_multimodal_meta(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    assets = with_asset_columns(d)
    return assets.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.source").alias("source"),
        F.md5("payload").alias("digest"),
    )


@query(
    "l05b_decode_features",
    oracle="""
        SELECT doc_id,
               'text/plain'                                           AS mime,
               octet_length(encode(text))                             AS n_bytes,
               CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks,
               md5(text)                                              AS digest
        FROM documents
        WHERE text IS NOT NULL
    """,
    doc="L5 decode/feature-extract via mapInPandas (Arrow-batched, "
    "map-only): stubbed decoder, real plumbing — deterministic "
    "features hash-checked against DuckDB.",
)
def l05b_decode_features(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return extract_features(with_asset_columns(d))


@query(
    "l05c_frame_sample",
    oracle="""
        WITH a AS (
            SELECT doc_id, octet_length(encode(text)) AS n_bytes
            FROM documents WHERE text IS NOT NULL
        ), f AS (
            SELECT doc_id, n_bytes,
                   unnest(range(0, CAST(ceil(n_bytes / 64.0) AS BIGINT), 2))
                       AS frame_idx
            FROM a
        )
        SELECT doc_id, frame_idx,
               frame_idx * 64 AS frame_offset,
               least(64, n_bytes - frame_idx * 64) AS frame_len
        FROM f
    """,
    doc="L5 frame sampling via mapInPandas — the 1→N expanding map a "
    "video pipeline uses (clip → every-Nth-frame rows): 64-byte "
    "'frames', stride 2, stubbed codec. Map-only (no shuffle; "
    "downstream per-frame ops key on (doc_id, frame_idx)); offsets "
    "and lengths are deterministic, so the Python expansion is "
    "hash-checked against DuckDB's unnest(range(...)).",
)
def l05c_frame_sample(spark, sf_dir):
    from bigdata_lab4_spark.functions.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    return sample_frames(with_asset_columns(d))
