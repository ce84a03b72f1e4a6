"""Multimodal plumbing tests: schema/batch shapes of the mapInPandas
media pipeline, expanding frame sampler, stubbed decoders."""

import pyspark.sql.functions as F
import pytest

from icebergplus_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    resize_image,
    sample_frames,
    sample_video_frames,
)
from icebergplus_spark.registry import QUERIES, load_all

load_all()


@pytest.fixture
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", F.col("text").cast("binary").alias("payload"))


def test_decoder_stubs_are_marked(media):
    for fn, args in [
        (decode_image, (b"x",)),
        (resize_image, (b"x", 10, 10)),
        (sample_video_frames, (b"x", 4)),
    ]:
        with pytest.raises(NotImplementedError):
            fn(*args)


def test_extract_features_shape_and_determinism(spark, media):
    feats = extract_features(media)
    assert dict(feats.dtypes) == {"doc_id": "bigint", "feature": "array<float>"}
    rows = feats.orderBy("doc_id").limit(5).collect()
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feature"])
    rows2 = extract_features(media).orderBy("doc_id").limit(5).collect()
    assert [r["feature"] for r in rows] == [r["feature"] for r in rows2]


def test_sample_frames_expands_rows(spark, media):
    n_docs = media.count()
    frames = sample_frames(media, n_frames=4)
    assert frames.count() == 4 * n_docs
    one = frames.filter(F.col("doc_id") == 0).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in one] == [0, 1, 2, 3]
    # offsets are monotonically increasing and payload-bounded
    offs = [r["frame_offset"] for r in one]
    assert offs == sorted(offs)
    assert all(len(r["frame_bytes"]) > 0 for r in one)


def test_m02_query_runs(spark, sf_dir):
    df = QUERIES["m02_multimodal_features"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 500
    assert all(r["dim"] == FEATURE_DIM for r in rows)


def test_ingest_binary_dir(spark, tmp_path):
    from icebergplus_spark.operators.multimodal import ingest_binary_dir

    # fake media dump: two "PNGs" (real magic number) and one text file
    png_magic = b"\x89PNG\r\n\x1a\n"
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "img1.png").write_bytes(png_magic + b"payload-one")
    (tmp_path / "img2.png").write_bytes(png_magic + b"payload-two-longer")
    (tmp_path / "notes.txt").write_bytes(b"not media")

    allf = ingest_binary_dir(spark, str(tmp_path))
    assert allf.count() == 3  # recursive listing picks up the subdir

    pngs = ingest_binary_dir(spark, str(tmp_path), glob="*.png")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in pngs.collect()}
    assert set(rows) == {"img1.png", "img2.png"}
    for r in rows.values():
        assert r["ext"] == "png"
        assert r["magic_hex"] == "89504E47"  # PNG magic, first 4 bytes
        assert r["n_bytes"] == len(bytes(r["payload"]))
    # ingested payloads feed the existing feature pipeline unchanged
    from icebergplus_spark.operators.multimodal import FEATURE_DIM, extract_features

    feats = extract_features(
        pngs.select(F.monotonically_increasing_id().alias("doc_id"), "payload")
    ).collect()
    assert len(feats) == 2
    assert all(len(r["feature"]) == FEATURE_DIM for r in feats)


def test_m05_detects_planted_media_neardups(spark):
    """r4 verdict `weak` fix: the perceptual-hash detector proven on
    PLANTED near-duplicate payloads (mirror of the d04 planted-neardup
    test): pairs within hamming ≤ 6 are found, pairs beyond are not,
    and reported distances are exact."""
    import pyspark.sql.functions as F

    from icebergplus_spark.operators.multimodal import (
        M05_HAMMING_MAX,
        phash_neardup_pairs,
    )

    def payload(flip_positions):
        # 64-byte payload: sample position i reads byte i; flipping the
        # low bit ('A'→'B') at k positions ⇒ phash hamming exactly k
        return "".join(
            "B" if i in flip_positions else "A" for i in range(64)
        )

    rows = [
        (1, payload(())),                       # anchor
        (2, payload((3,))),                     # hamming 1 from anchor
        (3, payload((3, 17, 40, 41))),          # hamming 4, band 3 clean
        (4, payload(tuple(range(0, 16)))),      # 16 flips — beyond radius
        (5, "Z" * 64),                          # unrelated payload
        (6, "Z" * 64),                          # exact dup of 5 (hamming 0)
    ]
    media = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_neardup_pairs(media).collect()
    }
    # NOTE the recall contract: 4 bands GUARANTEE detection only for
    # hamming <= 3 (pigeonhole); 4..6 are found iff one band is clean
    # (true for doc 3: its flips cluster in bands 0-2)
    assert got == {
        (1, 2): 1,
        (1, 3): 4,
        (2, 3): 3,  # 17/40/41 differ; position 3 matches
        (5, 6): 0,
    }
    assert all(h <= M05_HAMMING_MAX for h in got.values())
