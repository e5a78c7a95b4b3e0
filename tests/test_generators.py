"""Seed-generator goldens transcribed from GeneratorsTest.java:9-62."""

from jcrawler_spark.functions.generators import generate, generate_all


def test_simple():
    assert generate("a") == ["a"]
    assert generate("a{baubau}") == ["abaubau"]
    assert generate("a{baubau") == ["a{baubau"]
    assert generate("abaubau}") == ["abaubau}"]


def test_simple_range():
    assert generate("b{1-3}") == ["b1", "b2", "b3"]
    assert generate("b{1-3}c") == ["b1c", "b2c", "b3c"]
    assert generate("{1-3}c") == ["1c", "2c", "3c"]
    assert generate("b{1-3}c{d") == ["b1c{d", "b2c{d", "b3c{d"]


def test_simple_alternatives():
    assert generate("b{1|3|foo}") == ["b1", "b3", "bfoo"]
    assert generate("b{1|3|foo}c") == ["b1c", "b3c", "bfooc"]
    assert generate("{1|3|foo}c") == ["1c", "3c", "fooc"]


def test_mixed_two():
    assert generate("b{1|3|foo}c{4-6}d") == [
        "b1c4d", "b1c5d", "b1c6d",
        "b3c4d", "b3c5d", "b3c6d",
        "bfooc4d", "bfooc5d", "bfooc6d",
    ]


def test_for_url():
    assert generate(
        "https://legislatie.just.ro/Public/{DetaliiDocument|DetaliiDocumentAfis}/{1-3}"
    ) == [
        "https://legislatie.just.ro/Public/DetaliiDocument/1",
        "https://legislatie.just.ro/Public/DetaliiDocument/2",
        "https://legislatie.just.ro/Public/DetaliiDocument/3",
        "https://legislatie.just.ro/Public/DetaliiDocumentAfis/1",
        "https://legislatie.just.ro/Public/DetaliiDocumentAfis/2",
        "https://legislatie.just.ro/Public/DetaliiDocumentAfis/3",
    ]


def test_optional_empty_alternative():
    assert generate("foo{bar|}zar") == ["foobarzar", "foozar"]


def test_no_expansion():
    assert generate("https://op.europa.eu/en/web/who-is-who/archive") == [
        "https://op.europa.eu/en/web/who-is-who/archive"
    ]


def test_accept_hostname_template():
    # the accept-set template used by the reference (JCrawler.java:635-636)
    assert generate("{http|https}://{www.|}mysite.com") == [
        "http://www.mysite.com",
        "http://mysite.com",
        "https://www.mysite.com",
        "https://mysite.com",
    ]


def test_generate_all_flatmap_order():
    assert generate_all(["a{1-2}", "b"]) == ["a1", "a2", "b"]
