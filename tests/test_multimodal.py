import pytest

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_media,
    resize_media,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 3000), (2, "short"), (3, None)], ["doc_id", "text"]
    )
    return attach_fake_media(docs)


def test_media_schema(media):
    # same names/types (nullability flags differ on computed columns)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    rows = {r.media_id: r for r in media.collect()}
    assert rows[1].meta.n_bytes == 3000
    assert rows[3].meta.n_bytes == 0


def test_decode_media_deterministic_fake(media):
    out = decode_media(media).orderBy("media_id").collect()
    assert len(out) == 3
    for r in out:
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        assert len(r.features) == 8
        assert all(0.0 <= f <= 1.0 for f in r.features)
    again = decode_media(media).orderBy("media_id").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]  # deterministic


def test_decode_media_strict_raises(media):
    with pytest.raises(NotImplementedError):
        decode_media(media, strict=True)


def test_decode_media_custom_decoder(media):
    out = decode_media(media, decoder=lambda b: (1, 2, [float(len(b or b""))]))
    row = {r.media_id: r for r in out.collect()}[1]
    assert (row.width, row.height, row.features) == (1, 2, [3000.0])


def test_media_id_from_string_doc_ids(spark):
    # string doc_ids (e.g. filename stems) must map to stable non-null ids,
    # not silently cast to NULL
    docs = spark.createDataFrame([("doc_a", "x"), ("doc_b", "y")], ["doc_id", "text"])
    ids = [r.media_id for r in attach_fake_media(docs).collect()]
    assert all(i is not None for i in ids)
    assert len(set(ids)) == 2


def test_empty_media_has_zero_frames(media):
    # doc 3 has NULL text -> empty content -> no frames (no phantom frame 0)
    frames = sample_frames(media, frame_size=1024, every_n=2)
    assert frames.filter("media_id = 3").count() == 0


def test_sample_frames(media):
    frames = sample_frames(media, frame_size=1024, every_n=2).collect()
    by_id = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    # 3000 bytes / 1024 -> frames 0,1,2 -> sampled 0,2
    assert sorted(f.frame_idx for f in by_id[1]) == [0, 2]
    assert len(by_id[1][0].frame_bytes) == 1024
    # short doc -> single frame 0
    assert [f.frame_idx for f in by_id[2]] == [0]


def test_resize_media_fake_scaler(media):
    out = {r.media_id: r for r in resize_media(media, 16, 8).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert (r.width, r.height) == (16, 8)
        assert len(r.content) == 16 * 8  # exact target byte count, even empty/NULL
    # deterministic + downsample preserves constant content
    assert out[1].content == b"x" * 128
    again = {r.media_id: r.content for r in resize_media(media, 16, 8).collect()}
    assert {m: r.content for m, r in out.items()} == again


def test_resize_media_strict_and_custom(media):
    with pytest.raises(NotImplementedError):
        resize_media(media, 4, 4, strict=True)
    out = resize_media(media, 4, 4, resizer=lambda b, w, h: b"z" * (w * h)).first()
    assert out.content == b"z" * 16


def test_media_average_hash_properties(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        attach_fake_media,
        hamming_near_dup_pairs,
        media_average_hash,
    )
    from pyspark.sql import functions as F

    base = "x" * 40 + "y" * 40 + "z" * 40
    near = "x" * 40 + "y" * 39 + "w" + "z" * 40  # one byte changed
    far = "".join(chr(97 + (i * 7) % 26) for i in range(120))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far), (5, "tiny")],
        "doc_id long, text string",
    )
    sigs = media_average_hash(attach_fake_media(docs))
    h = {r.media_id: r.ahash for r in sigs.collect()}
    assert h[1] == h[2]  # identical content -> identical hash
    assert h[5] is None  # < grid pixels -> no stable signature
    assert bin((h[1] ^ h[3]) & ((1 << 64) - 1)).count("1") <= 4  # near: few bits
    pairs = hamming_near_dup_pairs(
        sigs.filter(F.col("ahash").isNotNull()),
        id_col="media_id", sig_col="ahash", max_hamming=4,
    ).collect()
    got = {(r.id1, r.id2) for r in pairs}
    assert (1, 2) in got and (1, 3) in got
    assert all(4 not in p for p in got)  # far content never pairs


def test_media_average_hash_strict_and_pixel_fn(spark):
    import pytest as _pytest

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators import (
        attach_fake_media,
        media_average_hash,
    )

    docs = spark.createDataFrame([(1, "a" * 100)], "doc_id long, text string")
    media = attach_fake_media(docs)
    with _pytest.raises(NotImplementedError):
        media_average_hash(media, strict=True)
    # a custom pixel_fn (the PIL seam) drives the same grid/threshold/pack
    flat = media_average_hash(media, pixel_fn=lambda b: [7] * 128).first()
    assert flat.ahash == -1  # every cell mean == global mean -> all bits set


def test_sample_frames_rejects_nonpositive_every_n(spark):
    import pytest

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.multimodal import (
        attach_fake_media,
        sample_frames,
    )

    media = attach_fake_media(
        spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    )
    with pytest.raises(ValueError, match="every_n"):
        sample_frames(media, every_n=0)


def test_attach_fake_media_null_ids_stay_distinct(spark):
    """xxhash64 of an all-NULL input is the bare seed (a constant): two
    NULL-id docs must not collapse onto one media_id."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.multimodal import (
        attach_fake_media,
    )

    df = spark.createDataFrame(
        [(None, "first text"), (None, "second text")], "doc_id long, text string"
    )
    ids = [r.media_id for r in attach_fake_media(df).collect()]
    assert len(set(ids)) == 2 and None not in ids
