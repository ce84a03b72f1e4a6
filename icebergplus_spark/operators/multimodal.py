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


def resize_image(payload: bytes, width: int, height: int):  # pragma: no cover
    """Resize an image payload. STUB: no pillow/libvips in container."""
    raise NotImplementedError("image resize requires pillow — not in container")


def sample_video_frames(payload: bytes, n_frames: int):  # pragma: no cover
    """Decode + sample frames from a video payload. STUB: no ffmpeg."""
    raise NotImplementedError("video decode requires ffmpeg — not in container")


FEATURE_DIM = 16
FEATURE_SCHEMA = "doc_id bigint, feature array<float>"


def _extract_features(batches: Iterator, /):
    """mapInPandas worker: deterministic fake 'embedding model' — a
    FEATURE_DIM float vector derived from the payload's md5 digest. The
    real model would be loaded once per worker here (the pattern this
    stub preserves: per-batch numpy work, per-worker init)."""
    import hashlib

    import numpy as np
    import pandas as pd

    for pdf in batches:
        feats = []
        for b in pdf["payload"]:
            digest = hashlib.md5(bytes(b)).digest()
            raw = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
            # scale by 256 (a power of two): byte/256 is exact in float32,
            # so downstream sums are bit-reproducible across engines
            v = np.resize(raw, FEATURE_DIM) / 256.0
            feats.append(v.tolist())
        yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "feature": feats})


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset bigint, frame_bytes binary"


def _sample_frames(n_frames: int):
    """mapInPandas worker factory: deterministic fake 'frame sampler' —
    splits the payload at n evenly-spaced offsets and emits ONE ROW PER
    FRAME (the expanding-output shape a real video sampler has)."""

    def worker(batches: Iterator, /):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_bytes": []}
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    off = min(i * step, max(len(b) - 1, 0))
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame_bytes"].append(b[off : off + step])
            yield pd.DataFrame(rows)

    return worker


def ingest_binary_dir(
    spark: SparkSession,
    directory: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Ingest raw media files as opaque binary rows via Spark's built-in
    ``binaryFile`` source: one row per file with (path, modificationTime,
    length, content). This is the on-ramp from an object-store dump of
    images/audio/video into the binary-column pipeline above.

    Scale notes: the source parallelizes over files (one split per file,
    capped by ``spark.sql.files.maxPartitionBytes`` grouping), and
    ``pathGlobFilter`` prunes at listing time — no bytes are read for
    filtered-out files. Metadata-only queries (path/length) still fetch
    file contents with this source, so project early and persist to
    parquet if the payload is reread."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(directory)
    return df.select(
        F.col("path"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified_at"),
        F.col("content").alias("payload"),
        F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1).alias("ext"),
        F.substring(F.hex(F.substring(F.col("content"), 1, 4)), 1, 8).alias(
            "magic_hex"
        ),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """binary payload → fixed-dim float feature vector (Arrow-batched)."""
    return media.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """binary payload → one row per sampled frame (expanding mapInPandas)."""
    return media.mapInPandas(_sample_frames(n_frames), schema=FRAME_SCHEMA)


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


# ---------------------------------------------------------------------------
# m02 — feature extraction + aggregation over extracted features.
# Oracle-checked: the fake "embedding model" is the md5 digest scaled by
# 1/256 — each component is an exact binary float, so the feature sum is
# the digest byte sum / 256 with NO rounding error, and DuckDB rebuilds
# it from the md5 hex string byte-by-byte. This pins down the whole
# Arrow path (binary column → mapInPandas → array<float> → JVM fold).
# ---------------------------------------------------------------------------
_M02_BYTES = " + ".join(
    f"CAST(('0x' || substring(hx, {2 * i + 1}, 2)) AS INTEGER)" for i in range(16)
)


@register(
    "m02_multimodal_features",
    oracle=f"""
WITH h AS (
  SELECT doc_id, md5(text) AS hx FROM documents  -- md5(VARCHAR) hashes utf-8 bytes
)
SELECT doc_id,
       CAST(({_M02_BYTES}) AS DOUBLE) / 256.0 AS feature_sum,
       CAST({FEATURE_DIM} AS INTEGER) AS dim
FROM h
""",
)
def m02_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    feats = extract_features(media)
    # aggregate feature statistics — exercises the array<float> output
    # column downstream of the Python worker; every term is a multiple of
    # 2^-8, so the double sum is exact (no round() needed for the oracle)
    return feats.select(
        "doc_id",
        F.aggregate(
            F.transform("feature", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("feature_sum"),
        F.size("feature").alias("dim"),
    )


# ---------------------------------------------------------------------------
# m03 — frame sampling: the EXPANDING mapInPandas shape (one input row →
# n_frames output rows) a real video sampler has, driven end-to-end. The
# deterministic fake sampler slices the payload at evenly-spaced offsets
# (_sample_frames above); the oracle recomputes every slice byte-for-byte
# in DuckDB and md5s it, pinning the whole Arrow round trip: binary in →
# pandas bytes → per-frame binary out → JVM md5/length. Real decode
# (ffmpeg) drops into the same worker behind sample_video_frames.
# ---------------------------------------------------------------------------
M03_FRAMES = 4


@register(
    "m03_frame_sampling",
    oracle=f"""
-- DuckDB has no BLOB substring; the corpus is ASCII (asserted:
-- OCTET_LENGTH = LENGTH for every row at every SF), so character
-- slicing on the VARCHAR equals the Python-side byte slicing, and
-- md5(VARCHAR) hashes the same utf-8 bytes.
WITH d AS (
  SELECT doc_id, text AS b, OCTET_LENGTH(CAST(text AS BLOB)) AS n
  FROM documents
),
f AS (
  SELECT doc_id, b, n, GREATEST(1, n // {M03_FRAMES}) AS step,
         unnest([{", ".join(str(i) for i in range(M03_FRAMES))}]) AS frame_idx
  FROM d
),
s AS (
  SELECT doc_id, frame_idx,
         LEAST(frame_idx * step, GREATEST(n - 1, 0)) AS off, step, b
  FROM f
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(off AS BIGINT) AS frame_offset,
       CAST(OCTET_LENGTH(CAST(substring(b, off + 1, step) AS BLOB)) AS BIGINT) AS frame_len,
       md5(substring(b, off + 1, step)) AS frame_md5
FROM s
""",
)
def m03_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    frames = sample_frames(media, n_frames=M03_FRAMES)
    # binary output columns crash the driver's canonicalizer — return
    # the md5 + length instead (a stronger check: any byte drift in the
    # Arrow round trip changes the digest).
    return frames.select(
        "doc_id",
        "frame_idx",
        "frame_offset",
        F.length("frame_bytes").cast("bigint").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_md5"),
    )


# ---------------------------------------------------------------------------
# m04 — cross-modal temporal alignment: every sampled video frame is
# matched to the most recent audio chunk at-or-before it (backward
# as-of join per media item) — the AV-sync step that precedes any
# audio-visual training pair construction. Timelines are synthesized
# deterministically from the corpus (250 ms frames vs 400 ms audio
# chunks), so the oracle can recompute the alignment in closed form
# while Spark runs the REAL as-of machinery (union-sort, one shuffle —
# operators/asof.py). Scale shape: state is per media item, the as-of
# join shuffles once on doc_id.
# ---------------------------------------------------------------------------
M04_FRAMES = 4  # at 250 ms → 0, 250, 500, 750 ms
M04_CHUNKS = 3  # at 400 ms → 0, 400, 800 ms


@register(
    "m04_av_alignment",
    oracle=f"""
WITH frames AS (
  SELECT doc_id, unnest(range({M04_FRAMES})) AS frame_idx FROM documents
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(frame_idx * 250 AS BIGINT) AS frame_ts_ms,
       CAST((frame_idx * 250) // 400 AS INTEGER) AS chunk_idx,
       md5(CAST(doc_id AS VARCHAR) || ':' ||
           CAST((frame_idx * 250) // 400 AS VARCHAR)) AS chunk_md5
FROM frames
""",
)
def m04_av_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergplus_spark.operators.asof import asof_join

    prepare_session(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    frames = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(M04_FRAMES - 1))).alias("frame_idx"),
    ).withColumn("frame_ts_ms", (F.col("frame_idx") * 250).cast("bigint"))
    audio = (
        docs.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(M04_CHUNKS - 1))).alias(
                "chunk_idx"
            ),
        )
        .withColumn("chunk_ts_ms", (F.col("chunk_idx") * 400).cast("bigint"))
        .withColumn(
            "chunk_md5",
            F.md5(F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx"))),
        )
    )
    aligned = asof_join(
        frames,
        audio,
        left_key="doc_id",
        right_key="doc_id",
        left_ts="frame_ts_ms",
        right_ts="chunk_ts_ms",
        payload_cols=["chunk_idx", "chunk_md5"],
        direction="backward",
    )
    return aligned.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        "frame_ts_ms",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "chunk_md5",
    )


# ---------------------------------------------------------------------------
# m05 — PERCEPTUAL-HASH NEAR-DUP over media payloads: the multimodal
# face of the dedup family. Each payload gets a 64-bit structural hash
# (one bit per evenly-spaced sample position — the shape of a real
# dHash/pHash, with the pixel decode behind the stub as everywhere in
# this module; the deterministic stand-in samples raw payload bytes),
# hashes are banded into 4×16-bit chunks (hamming-LSH — pigeonhole
# GUARANTEES a shared chunk for distance ≤ 3; distances 4–6 are kept
# when found, i.e. when one band is clean), bucket-mates are
# compared by bit_count(xor). No cross join; one shuffle to band, one
# bucket self-join — d05's banding applied to binary media. The oracle
# rebuilds every sampled byte, both 32-bit signature halves, the bands
# and the hamming distances in DuckDB, so the whole Arrow pipeline is
# hash-exact.
# ---------------------------------------------------------------------------
M05_BITS = 64
M05_HAMMING_MAX = 6
# Planted near-duplicate payloads (64 bytes → sample position i reads
# byte i): B differs from A in the LOW BIT of bytes 10/20/30 ('A'→'B'),
# so phash hamming = 3 ≤ 6 while bands 2 and 3 still collide.
M05_PLANT_A = "A" * 64
M05_PLANT_B = "".join(
    "B" if i in (10, 20, 30) else "A" for i in range(64)
)


def _phash_worker(batches: Iterator, /):
    """mapInPandas worker: deterministic fake perceptual hash — bit i is
    the low bit of the payload byte at position floor(i*n/64). A real
    pHash (DCT over decoded pixels) drops in behind decode_image."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        sigs = []
        for b in pdf["payload"]:
            b = bytes(b)
            n = len(b)
            if n == 0:
                sigs.append(0)
                continue
            sig = 0
            for i in range(M05_BITS):
                pos = min(i * n // M05_BITS, n - 1)
                sig |= (b[pos] & 1) << i
            sigs.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "phash": sigs}
        )


@register(
    "m05_phash_neardup",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL  -- planted near-dup pair, mirrored in the Spark query
  SELECT -2, repeat('A', 10) || 'B' || repeat('A', 9) || 'B'
             || repeat('A', 9) || 'B' || repeat('A', 33)
  UNION ALL
  SELECT -1, repeat('A', 64)
),
lens AS (
  -- blob indexing via its hex string (2 chars per byte): this DuckDB
  -- build has no substring(BLOB)
  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
         OCTET_LENGTH(CAST(text AS BLOB)) AS n
  FROM corpus
),
bits AS (
  SELECT doc_id, b.range AS bit,
         CASE WHEN n = 0 THEN 0 ELSE
           CAST(('0x' || substring(hx,
                CAST(LEAST(b.range * n // 64, n - 1) AS INTEGER) * 2 + 1, 2))
             AS INTEGER) & 1
         END AS v
  FROM lens, range(64) b
),
sigs0 AS (
  SELECT doc_id,
         CAST(
           CAST(SUM(CASE WHEN v = 1 AND bit >= 32
                         THEN CAST(1 AS BIGINT) << (bit - 32) ELSE 0 END) AS UBIGINT)
             * 4294967296
           + CAST(SUM(CASE WHEN v = 1 AND bit < 32
                           THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS UBIGINT)
           AS UBIGINT) AS sig
  FROM bits GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, sig, c.range AS chunk_id,
         CAST((sig >> CAST(16 * c.range AS UBIGINT)) & 65535 AS INTEGER) AS chunk_val
  FROM sigs0, range(4) c
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sig AS sig_a, b.sig AS sig_b
  FROM chunks a
  JOIN chunks b ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
              AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
FROM pairs
WHERE bit_count(xor(sig_a, sig_b)) <= 6
""",
)
def m05_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    # Planted near-dup pair (r4 verdict: the organic corpus has no
    # hamming≤6 pair at the sf0.01 gate, making the record vacuously
    # empty). Two synthetic payloads 3 sampled-low-bits apart guarantee
    # a non-empty result at EVERY sf; the oracle plants the identical
    # rows, so the detector — not just empty-set plumbing — is what the
    # hash compare certifies.
    planted = spark.createDataFrame(
        [(-2, M05_PLANT_B), (-1, M05_PLANT_A)], "doc_id long, text string"
    )
    media = (
        docs.select("doc_id", "text")
        .unionByName(planted)
        .select("doc_id", F.col("text").cast("binary").alias("payload"))
    )
    return phash_neardup_pairs(media)


def phash_neardup_pairs(media: DataFrame) -> DataFrame:
    """Hamming-LSH near-dup over (doc_id, payload binary): 64-bit
    structural hash → 4×16-bit bands (pigeonhole: distance ≤ 3 ⇒ at
    least one shared band GUARANTEED; distances 4–6 surface when one
    band is clean) → bucket self-join → exact bit_count(xor) filter.
    No cross join at any scale."""
    sigs = media.mapInPandas(_phash_worker, schema="doc_id bigint, phash bigint")
    # Materialize the signatures ONCE (r13, guide §4.4/§3.3): the band
    # self-join below duplicates its input subtree, so without this the
    # phash worker re-hashed every payload on BOTH join sides (two
    # MapInPandas nodes in the executed plan). (doc_id, phash) is tiny
    # and per-run.
    sigs = sigs.localCheckpoint()
    # band into 4×16-bit chunks (unsigned view of the signed long)
    usig = F.conv(F.hex(F.col("phash")), 16, 10).cast("decimal(20,0)")
    chunks = sigs.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("phash"), 16 * c)
                        .bitwiseAND(F.lit(65535))
                        .cast("int")
                        .alias("chunk_val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "phash", "ch.chunk_id", "ch.chunk_val")
    a = chunks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("sig_a"),
        "chunk_id",
        "chunk_val",
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("sig_b"),
        "chunk_id",
        "chunk_val",
    )
    pairs = (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(
        F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    ).cast("int")
    return pairs.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= M05_HAMMING_MAX
    )
