from pyspark.sql import functions as F

from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions import (
    clean_thinking_tokens,
    doc_fingerprint,
    language_id,
    normalize_whitespace,
    sanitize_model_name,
    truncate_tokens,
    ws_token_count,
)


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], ["v"]).select(col.alias("r")).first()["r"]


def test_clean_thinking_tokens_matches_reference_semantics(spark):
    # mirrors the reference's inline smoke test (run_full_evaluation_pipeline.py:193-197)
    raw = "<think>\nreasoning\nlines\n</think>\n\n\nReal summary. <THINKING>more</THINKING> End."
    cleaned = _one(spark, clean_thinking_tokens(F.col("v")), raw)
    assert "<think>" not in cleaned.lower()
    assert "reasoning" not in cleaned
    assert cleaned.startswith("Real summary.")
    assert cleaned.endswith("End.")
    # python reference implementation agreement
    import re

    expected = raw
    for tag in ("think", "thinking", "thought", "reasoning", "analysis"):
        expected = re.sub(
            rf"<{tag}>.*?</{tag}>", "", expected, flags=re.DOTALL | re.IGNORECASE
        )
    expected = re.sub(r"\n\s*\n\s*\n", "\n\n", expected).strip()
    assert cleaned == expected


def test_ws_token_count_matches_python_split(spark):
    for text in ["a b  c", "", "   ", "one", "x\n\ny z\t w"]:
        got = _one(spark, ws_token_count(F.col("v")), text)
        assert got == len(text.split()), text


def test_ws_token_count_null_propagates(spark):
    # NULL text -> NULL, never the legacy size(NULL) = -1 (matches DuckDB
    # len(NULL) so cross-engine aggregates over missing text agree)
    df = spark.createDataFrame([(None,)], "v string")
    assert df.select(ws_token_count(F.col("v")).alias("n")).first()["n"] is None


def test_truncate_tokens(spark):
    assert _one(spark, truncate_tokens(F.col("v"), 3), "a b c d e") == "a b c"
    assert _one(spark, truncate_tokens(F.col("v"), 10), "a b") == "a b"
    assert _one(spark, truncate_tokens(F.col("v"), 3), "") == ""


def test_sanitize_and_normalize(spark):
    assert _one(spark, sanitize_model_name(F.col("v")), "llama3.2:3b") == "llama3_2_3b"
    assert _one(spark, normalize_whitespace(F.col("v")), "  a \n b\t\tc ") == "a b c"


def test_language_id_picks_stopword_language(spark):
    assert _one(spark, language_id(F.col("v")), "the cat and the dog is here") == "en"
    assert _one(spark, language_id(F.col("v")), "der hund und die katze ist") == "de"
    assert _one(spark, language_id(F.col("v")), "zzz qqq") == "und"


def test_doc_fingerprint_normalizes_whitespace(spark):
    a = _one(spark, doc_fingerprint(F.col("v")), "hello   world")
    b = _one(spark, doc_fingerprint(F.col("v")), "hello world\n")
    c = _one(spark, doc_fingerprint(F.col("v")), "hello worlds")
    assert a == b != c


def test_tiny_bpe_tokenizer_properties():
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.bpe import (
        TinyBPETokenizer,
    )

    t = TinyBPETokenizer()
    text = "Xin chào thế giới! The quick brown fox jumps over 1234 lazy dogs."
    toks = t.tokenize(text)
    assert "".join(toks) == text  # lossless
    assert t.count(text) == len(toks) == len(t.encode(text))
    # subword granularity: between word count and char count
    assert len(text.split()) < t.count(text) < len(text)
    # deterministic across instances
    assert TinyBPETokenizer().tokenize(text) == toks
    # truncate keeps a prefix of the token stream
    assert t.truncate(text, 3) == "".join(toks[:3])
    assert t.truncate(text, 10_000) == text
    assert t.count("") == 0 and t.tokenize("") == [] and t.truncate("", 5) == ""


def test_bpe_udfs_on_spark(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.bpe import (
        TinyBPETokenizer,
    )
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.text import (
        bpe_token_count_udf,
        bpe_truncate_udf,
    )

    t = TinyBPETokenizer()
    data = [(1, "Xin chào thế giới"), (2, "hello world again"), (3, ""), (4, None)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    cnt = bpe_token_count_udf()
    trunc = bpe_truncate_udf(2)
    rows = {
        r.doc_id: r
        for r in df.select("doc_id", cnt("text").alias("n"), trunc("text").alias("tr")).collect()
    }
    for doc_id, text in data:
        assert rows[doc_id].n == t.count(text or "")
        assert rows[doc_id].tr == t.truncate(text or "", 2)


def test_filename_stem_extensionless_and_dotfiles(spark):
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.text import (
        filename_stem,
    )

    df = spark.createDataFrame(
        [("/data/docs/readme",), ("/data/.gitignore",), ("/a/b/name.txt",), ("name.",)],
        ["p"],
    )
    got = [r.s for r in df.select(filename_stem("p").alias("s")).collect()]
    # Path.stem parity: basename when there is no real extension
    assert got == ["readme", ".gitignore", "name", "name."]


def test_bpe_pathological_run_is_bounded_and_lossless():
    """A single-class megatoken (base64/minified-JS shape) must not take
    O(len^3) work: long pre-tokens are sliced into bounded windows, still
    losslessly round-tripping."""
    import time

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.functions.bpe import (
        TinyBPETokenizer,
    )

    tok = TinyBPETokenizer()
    run = "9" * 100_000  # one digit-class pre-token
    t0 = time.perf_counter()
    syms = tok.tokenize(run)
    assert time.perf_counter() - t0 < 10.0  # unbounded loop took minutes
    assert "".join(syms) == run
