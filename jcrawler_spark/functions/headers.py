"""Request-header block parsing (SURVEY.md §2.5).

Observable contract from JCrawler.CrawlerWorker.headers
(JCrawler.java:1328-1366) and its golden (JCrawlerTest.java:363-372):
a header text block is split into lines; excluded header names are dropped;
multi-valued headers are split on commas into repeated "Name: value" pairs —
EXCEPT for headers whose values legitimately contain commas (User-Agent,
Referer, Cookie and anything passed in `excludes`... the golden shows only
the split behavior for Accept).

Request headers are crawl config, so this runs driver-side.
"""

from __future__ import annotations

# headers never comma-split (dates/UA contain commas); mirrors the
# reference's special-casing of User-Agent/Referer/Cookie
_NO_SPLIT = {"user-agent", "referer", "cookie", "date", "if-modified-since"}


def parse_headers(text: str, *excludes: str) -> list[str]:
    """Parse a raw header block into ["Name: value", ...] pairs, splitting
    multi-value headers on commas (golden JCrawlerTest.java:363-372)."""
    excluded = {e.lower() for e in excludes}
    out: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or ":" not in line:
            continue
        name, _, value = line.partition(":")
        name = name.strip()
        value = value.strip()
        if name.lower() in excluded:
            continue
        if name.lower() in _NO_SPLIT:
            out.append(f"{name}: {value}")
            continue
        for part in value.split(","):
            part = part.strip()
            if part:
                out.append(f"{name}: {part}")
    return out
