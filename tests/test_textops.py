"""Goldens for the deterministic text layer (input_hint invariant) and the
text-analysis scalars."""

from __future__ import annotations

from jcrawler_spark.functions import textops


def test_extract_text_strips_tags_and_scripts():
    html = (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script>var x=1;</script></head>"
        "<body><h1>Hello</h1><p>world &amp; peace</p>"
        "<!-- comment --><div>again</div></body></html>"
    )
    assert textops.extract_text(html) == "T\nHello\nworld & peace\nagain"


def test_extract_text_whitespace_normalization():
    assert textops.extract_text("<p>a   b</p>\n\n\n<p>c</p>") == "a b\nc"


def test_extract_text_deterministic():
    html = "<body><p>x &lt;3 y</p></body>"
    assert textops.extract_text(html) == textops.extract_text(html) == "x <3 y"


def test_tokenize_bpe_ish():
    assert textops.tokenize("Hello, world! v2.0") == [
        "Hello", ",", "world", "!", "v2", ".", "0",
    ]
    assert textops.token_count("a b") == 2
    assert textops.whitespace_token_count("a  b\tc") == 3


def test_lang_id():
    assert textops.lang_id("the cat and the dog of the town") == "en"
    assert textops.lang_id("aceasta este pentru noi și pentru voi din nou") == "ro"
    assert textops.lang_id("xyzzy plugh") == "und"


def test_quality_score_bounds_and_order():
    good = ("the quick brown fox and the lazy dog " * 20).strip()
    bad = "@@@@ #### $$$$"
    assert 0.0 <= textops.quality_score(bad) < textops.quality_score(good) <= 1.0
    assert textops.quality_score("") == 0.0


def test_fingerprint_properties():
    a = textops.doc_fingerprint("the quick brown fox jumps over the lazy dog")
    b = textops.doc_fingerprint("the quick brown fox jumps over the lazy dog")
    c = textops.doc_fingerprint("a completely different document body here")
    assert a == b
    assert a != c
    assert -(1 << 63) <= a < (1 << 63)  # signed 64-bit for BIGINT parity


def test_fnv1a64_golden():
    # standard FNV-1a vectors
    assert textops.fnv1a64("") == 0xCBF29CE484222325
    assert textops.fnv1a64("a") == 0xAF63DC4C8601EC8C


def test_column_forms_match_python(spark):
    from pyspark.sql import functions as F

    rows = [
        ("the cat and the dog of the town went to the well",),
        ("aceasta este pentru noi și pentru voi din nou la masă",),
        ("xyzzy plugh !!",),
        ("",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    got = df.select(
        "text",
        textops.lang_id_col(F.col("text")).alias("lang"),
        textops.token_count_col(F.col("text")).alias("ntok"),
        textops.quality_score_col(F.col("text")).alias("q"),
    ).collect()
    for r in got:
        assert r["lang"] == textops.lang_id(r["text"])
        assert r["ntok"] == textops.token_count(r["text"])
        assert abs(r["q"] - textops.quality_score(r["text"])) < 1e-9
