"""JSONL corpus source/sink (sources/jsonl.py): declared schema, corrupt-
line capture, round trip."""

import gzip
import json
import os

import pytest

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources.jsonl import (
    read_jsonl_corpus,
    split_corrupt,
    write_jsonl_corpus,
)


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}),
        json.dumps({"doc_id": 2, "text": "xin chào", "lang": "vi", "source": "web"}),
        '{"doc_id": 3, "text": "broken',  # truncated line
        "not json at all",
        json.dumps({"doc_id": 4, "text": None, "lang": "en", "source": "books"}),
    ]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_with_corrupt_ledger(spark, jsonl_dir):
    df = read_jsonl_corpus(spark, jsonl_dir)
    clean, corrupt = split_corrupt(df)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[2].text == "xin chào"
    assert rows[4].text is None  # explicit null survives as a clean row
    bad = sorted(r.raw_line for r in corrupt.collect())
    assert bad == ["not json at all", '{"doc_id": 3, "text": "broken']


def test_drop_malformed_mode(spark, jsonl_dir):
    df = read_jsonl_corpus(spark, jsonl_dir, keep_corrupt=False)
    assert sorted(r.doc_id for r in df.collect()) == [1, 2, 4]


def test_split_requires_ledger_column(spark, jsonl_dir):
    df = read_jsonl_corpus(spark, jsonl_dir, keep_corrupt=False)
    with pytest.raises(ValueError):
        split_corrupt(df)


def test_round_trip(spark, jsonl_dir, tmp_path):
    out = str(tmp_path / "out")
    clean, _ = split_corrupt(read_jsonl_corpus(spark, jsonl_dir))
    write_jsonl_corpus(clean.repartition(1), out)
    files = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert len(files) == 1
    with gzip.open(os.path.join(out, files[0]), "rt") as f:
        got = sorted(json.loads(l)["doc_id"] for l in f)
    assert got == [1, 2, 4]
    back = read_jsonl_corpus(spark, out)
    c2, bad2 = split_corrupt(back)
    assert c2.count() == 3 and bad2.count() == 0


def test_modes_share_one_corrupt_definition(spark, tmp_path):
    """keep_corrupt=False must go through the SAME parse stage as
    keep_corrupt=True, not the native JSON relation: the native source
    explodes a top-level JSON array line into several clean rows where
    from_json ledgers it as ONE corrupt record — two definitions of
    'document vs corrupt' means the two modes silently return different
    corpora from the same file."""
    p = tmp_path / "arrayline.jsonl"
    p.write_text(
        json.dumps({"doc_id": 1, "text": "a", "lang": "en", "source": "w"})
        + "\n"
        + json.dumps(
            [
                {"doc_id": 2, "text": "b", "lang": "en", "source": "w"},
                {"doc_id": 3, "text": "c", "lang": "en", "source": "w"},
            ]
        )
        + "\n"
    )
    clean, corrupt = split_corrupt(read_jsonl_corpus(spark, str(p)))
    dropped = read_jsonl_corpus(spark, str(p), keep_corrupt=False)
    assert [r.doc_id for r in clean.collect()] == [1]
    assert corrupt.count() == 1  # the array line, ledgered whole
    assert [r.doc_id for r in dropped.collect()] == [1]  # same corpus


def test_schema_with_ledger_column_is_rejected(spark, jsonl_dir):
    """Re-reading a frame persisted WITH its _corrupt_record column would
    otherwise build a from_json schema with a duplicate field and fail with
    an opaque AnalysisException — refuse it with a clear error instead."""
    from pyspark.sql import types as T

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources.jsonl import (
        DOC_SCHEMA,
    )

    bad = T.StructType(
        list(DOC_SCHEMA.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl_corpus(spark, jsonl_dir, schema=bad)


def test_blank_lines_are_skipped_in_both_modes(spark, tmp_path):
    p = tmp_path / "blanky.jsonl"
    p.write_text(
        "\n"
        + json.dumps({"doc_id": 1, "text": "a", "lang": "en", "source": "w"})
        + "\n\n   \n\r\n\t\n"
        + json.dumps({"doc_id": 2, "text": "b", "lang": "en", "source": "w"})
        + "\n\n"
    )
    clean, corrupt = split_corrupt(read_jsonl_corpus(spark, str(p)))
    # no all-NULL phantom rows from the blank lines, and nothing ledgered
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
    assert corrupt.count() == 0
    dropped = read_jsonl_corpus(spark, str(p), keep_corrupt=False)
    assert dropped.count() == 2  # both modes agree on the corpus
