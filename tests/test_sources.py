from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators.pairing import (
    positional_zip_join,
)
from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources import (
    read_text_corpus,
    write_per_doc_text,
)


def test_text_corpus_roundtrip(spark, tmp_path):
    # S1/S2: directory of txt files -> (doc_id, text); S5: per-doc sink
    src = tmp_path / "corpus"
    src.mkdir()
    (src / "doc_a.txt").write_text("alpha text\nwith lines")
    (src / "doc_b.txt").write_text("beta text")
    (src / "ignored.json").write_text("{}")  # extension filter must skip this

    corpus = read_text_corpus(spark, str(src))
    rows = {r.doc_id: r.text for r in corpus.collect()}
    assert rows == {"doc_a": "alpha text\nwith lines", "doc_b": "beta text"}

    out = tmp_path / "sink"
    summaries = corpus.select("doc_id", F.upper("text").alias("summary"))
    write_per_doc_text(summaries, str(out))
    back = spark.read.text(str(out) + "/doc_id=doc_a").collect()
    assert "ALPHA TEXT" in back[0].value


def test_collect_to_files_reference_layout(spark, tmp_path):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources.corpus import (
        collect_to_files,
    )

    df = spark.createDataFrame([("a", "sum a"), ("b", None)], ["doc_id", "summary"])
    out = tmp_path / "flat"
    n = collect_to_files(df, str(out))
    assert n == 2
    assert (out / "a.txt").read_text() == "sum a"
    assert (out / "b.txt").read_text() == ""  # null summary -> empty file
    # round-trip through the corpus reader restores (doc_id, text);
    # zero-byte files are skipped by the binaryFile source (documented)
    back = {r.doc_id: r.text for r in read_text_corpus(spark, str(out)).collect()}
    assert back == {"a": "sum a"}


def test_positional_zip_join(spark):
    # J3: the reference's zip(generated, references) made deterministic
    left = spark.createDataFrame([("b", 2), ("a", 1)], ["k", "v"])
    right = spark.createDataFrame([("a", 10), ("b", 20)], ["k2", "w"])
    out = positional_zip_join(left.select("k"), right.select("k2"), "k", "k2").collect()
    # both sorted -> positions align: a-a, b-b
    assert sorted((r.k, r.k2) for r in out) == [("a", "a"), ("b", "b")]


def test_parquet_scan_pushdown_and_pruning(spark, sf_dir):
    """The 100 TB contract: a filtered 2-column projection must reach the
    parquet scan as PushedFilters + a pruned ReadSchema — not a full-table
    read filtered afterwards."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import functions as F

    df = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 1)
        .select("o_orderkey", "o_totalprice")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)]" in plan, plan
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "o_totalprice" in read and "o_comment" not in read, read


def test_write_per_doc_text_incremental_rerun_keeps_old_docs(spark, tmp_path):
    """The skip_existing pairing hands the sink a frame holding ONLY the new
    docs; dynamic partition overwrite must replace just those partitions —
    static mode truncated the whole directory, silently deleting every
    previously written summary."""
    import glob

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources.corpus import (
        write_per_doc_text,
    )

    out = str(tmp_path / "perdoc")
    run1 = spark.createDataFrame([(1, "alpha"), (2, "beta")], ["doc_id", "summary"])
    write_per_doc_text(run1, out)
    run2 = spark.createDataFrame([(3, "gamma")], ["doc_id", "summary"])  # new only
    write_per_doc_text(run2, out)
    dirs = sorted(d.rsplit("=", 1)[1] for d in glob.glob(f"{out}/doc_id=*"))
    assert dirs == ["1", "2", "3"]  # runs 1 AND 2 both present


def test_collect_to_files_raises_on_sanitize_collision(spark, tmp_path):
    import pytest

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources.corpus import (
        collect_to_files,
    )

    df = spark.createDataFrame([("a/b", "one"), ("a_b", "two")], ["doc_id", "summary"])
    with pytest.raises(ValueError, match="sanitize"):
        collect_to_files(df, str(tmp_path / "files"))


def test_nanos_conf_is_pinned_session_wide(spark, sf_dir):
    """nanosAsLong rides in the semantic confs, so reads are order-
    independent (previously the first events load flipped it mid-session,
    changing other ns-parquet reads' schemas by call order)."""
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.sources.tables import (
        ensure_semantic_confs,
    )

    ensure_semantic_confs(spark)
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
