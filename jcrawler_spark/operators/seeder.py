"""Search-engine seeder — S7, the last SURVEY §2.1 source.

The reference's JSeeder
(/root/reference/src/main/java/org/raisercostin/jcrawler/JSeeder.java:13-43)
builds a google SERP URL, fetches it with a declared bot user-agent, and
harvests seed URLs from every anchor whose href matches
``\\/url\\?q=(https?\\:\\/\\/.+)&sa`` (Java regex, GREEDY ``.+`` — the
capture runs to the LAST ``&sa`` in the href), in document order.

This module reproduces that observable contract with the network leg made
injectable: URL construction and link harvesting are pure and golden-
tested; ``seed_from_search`` takes any ``fetch_fn(url, user_agent) ->
html`` (default: stdlib urllib GET with the reference's exact user-agent)
so tests drive it against a stub HTTP server and production points it at
the live engine or any internal SERP service. The live leg is the only
environmental part — the same split as HttpFetcher vs SyntheticFetcher
(DIVERGENCES.md "Sandbox substitutions").

Anchor discovery uses a regex over ``<a ... href=...>`` instead of a DOM
parse (the reference uses Jsoup): for SERP-shaped documents (quoted
hrefs) the extracted href sequence is identical, and the golden tests pin
the reference regex's greedy semantics bit-for-bit.

Seeds are a driver-side list by design — seeding is the one O(seeds)
driver step the engine already has (engine.seed); a SERP returns at most
``count`` rows, never a scale concern.
"""

from __future__ import annotations

import re
import urllib.parse
import urllib.request

# JSeeder.java:16-20 — exact request shape
GOOGLE = "http://www.google.com/search?q="
USER_AGENT = "ExampleBot 1.0 (+http://example.com/bot)"
CHARSET = "UTF-8"

# JSeeder.java:26 — greedy, anchored mid-href; translated verbatim
_RESULT_RE = re.compile(r"\/url\?q=(https?\:\/\/.+)&sa")

# href attribute of every <a> tag, document order (quoted forms; SERP
# markup always quotes)
_ANCHOR_HREF_RE = re.compile(
    r"<a\b[^>]*?\bhref\s*=\s*(\"([^\"]*)\"|'([^']*)')", re.IGNORECASE | re.DOTALL
)


def serp_url(query: str, count: int, base: str = GOOGLE) -> str:
    """JSeeder.java:16-21: base + urlencode(query) + &num=count&start=0."""
    return f"{base}{urllib.parse.quote_plus(query, encoding=CHARSET)}&num={count}&start=0"


def extract_serp_links(html: str) -> list[str]:
    """Harvest result URLs from SERP markup (JSeeder.extractLinks,
    JSeeder.java:28-43): for each anchor href, the FIRST match of the
    greedy ``/url?q=(https?://.+)&sa`` pattern contributes group(1);
    non-matching anchors are skipped; document order is preserved."""
    out: list[str] = []
    for m in _ANCHOR_HREF_RE.finditer(html):
        href = m.group(2) if m.group(2) is not None else m.group(3)
        rm = _RESULT_RE.search(href)
        if rm:
            out.append(rm.group(1))
    return out


def _default_fetch(url: str, user_agent: str) -> str:
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.read().decode(CHARSET, errors="replace")


def seed_from_search(
    query: str,
    count: int = 10,
    base: str = GOOGLE,
    fetch_fn=None,
) -> list[str]:
    """findShopsWithJsoup (JSeeder.java:13-24): build the SERP URL, GET it
    as the declared bot, harvest result links. Returns the seed list for
    ``CrawlEngine.seed`` / ``CrawlConfig.urls``."""
    url = serp_url(query, count, base)
    html = (fetch_fn or _default_fetch)(url, USER_AGENT)
    return extract_serp_links(html)


# ---------------------------------------------------------------------------
# Bulk Spark surface: harvest a TABLE of SERP snapshots
# ---------------------------------------------------------------------------
#
# The reference seeds one crawl from one live SERP; at pipeline scale the
# same harvest runs over a corpus of archived SERP pages (one row per
# snapshot).  ``serp_links_udf`` applies the identical pure harvest —
# anchor hrefs in document order, the greedy JSeeder regex — as an Arrow
# pandas_udf (the declared-UDF pattern shared with extract/htmlnorm/
# pagediff): embarrassingly parallel map, bytes never leave executors,
# no shuffle.

import pandas as _pd  # noqa: E402
from pyspark.sql import functions as _SF  # noqa: E402
from pyspark.sql import types as _ST  # noqa: E402


@_SF.pandas_udf(_ST.ArrayType(_ST.StringType()))
def serp_links_udf(html: _pd.Series) -> _pd.Series:
    return html.map(lambda h: extract_serp_links(h) if h is not None else None)
