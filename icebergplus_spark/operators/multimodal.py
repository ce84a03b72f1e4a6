"""Multimodal column handling (north star; SURVEY.md §2.B "multimodal").

Pattern: media is an opaque ``binary`` column + typed metadata struct;
heavy decode/feature steps run as Arrow-batched ``mapInPandas`` so each
Python worker sees columnar batches, never single rows. The actual
image/audio decode libs are NOT in this container, so ``decode_image``
is a clearly-marked stub (NotImplementedError) and the pipeline under
test uses a deterministic fake extractor — the Spark-side plumbing
(schema, batching, partitioning) is real and oracle-checked.

Scale notes: binary payloads inflate row size — ``mapInPandas`` with
``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned down keeps batch
memory bounded; metadata-only queries never touch the payload column
thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from icebergplus_spark.registry import register
from icebergplus_spark.session import prepare_session
from icebergplus_spark.sources import load_table

META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, fake_width int, fake_height int, header_hex string"
)


def decode_image(payload: bytes):  # pragma: no cover - documented stub
    """Decode an image payload to pixels. STUB: pillow/ffmpeg are not in
    this container. The Spark plumbing around it (binary column →
    mapInPandas batches → struct metadata) is real and tested with the
    deterministic fake below."""
    raise NotImplementedError("image decode requires pillow/libvips — not in container")


def _extract_meta(batches: Iterator, /):
    """mapInPandas worker: deterministic fake 'media inspector' — byte
    length, a fake geometry derived from it, and the first 4 payload
    bytes as hex (the bit a real decoder would read as a magic number)."""
    import pandas as pd

    for pdf in batches:
        payload = pdf["payload"]
        n_bytes = payload.map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "fake_width": (n_bytes % 640 + 1).astype("int32"),
                "fake_height": (n_bytes % 480 + 1).astype("int32"),
                "header_hex": payload.map(lambda b: bytes(b[:4]).hex()),
            }
        )


# ---------------------------------------------------------------------------
# m01 — binary-column metadata extraction via mapInPandas
# (payload synthesized from documents.text so the oracle can replicate it)
# ---------------------------------------------------------------------------
@register(
    "m01_multimodal_meta",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 640 + 1 AS INTEGER) AS fake_width,
       CAST(OCTET_LENGTH(CAST(text AS BLOB)) % 480 + 1 AS INTEGER) AS fake_height,
       hex(CAST(SUBSTRING(text, 1, 4) AS BLOB)) AS header_hex
FROM documents
""",
)
def m01_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    out = media.mapInPandas(_extract_meta, schema=META_SCHEMA)
    # DuckDB hex() is uppercase; normalize ours to match.
    return out.withColumn("header_hex", F.upper("header_hex"))
