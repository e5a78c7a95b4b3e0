"""Header-parse golden from JCrawlerTest.java:363-372."""

from jcrawler_spark.functions.headers import parse_headers


def test_accept_header_split_on_commas():
    headers = parse_headers(
        "Accept: text/html,application/xhtml+xml,application/xml;q=0.9,"
        "image/avif,image/webp,image/apng,*/*;q=0.8,"
        "application/signed-exchange;v=b3;q=0.7\n",
        "Cookie",
        "Referer",
    )
    assert headers == [
        "Accept: text/html",
        "Accept: application/xhtml+xml",
        "Accept: application/xml;q=0.9",
        "Accept: image/avif",
        "Accept: image/webp",
        "Accept: image/apng",
        "Accept: */*;q=0.8",
        "Accept: application/signed-exchange;v=b3;q=0.7",
    ]


def test_excluded_headers_dropped():
    assert parse_headers("Cookie: a=b\nAccept: x\n", "Cookie") == ["Accept: x"]


def test_no_split_headers():
    assert parse_headers("User-Agent: Mozilla/5.0 (X11, Linux)\n") == [
        "User-Agent: Mozilla/5.0 (X11, Linux)"
    ]
