"""Regenerate the pinned VALUES oracles for the stateful contract queries
(crawl_wave, crawl_emission in __spark_entry__.py) from the INDEPENDENT
pure-Python implementations — no Spark involved:

  * crawl_wave     — tests/crawl_oracle._links_of over corpus.local_pages
                     (extract → self-filter → first-wins → accept);
  * crawl_emission — tests/crawl_oracle.crawl_oracle (FIFO/wave scheduler,
                     ParallelGraphTraverser semantics) at wave_budget=20,
                     max_docs=60 on the deterministic 500-page corpus.

Run: python tools/gen_crawl_oracles.py   (prints both VALUES blocks)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from jcrawler_spark import corpus  # noqa: E402
from jcrawler_spark.functions import urlops  # noqa: E402
from jcrawler_spark.operators import accept as accept_ops  # noqa: E402

from crawl_oracle import _links_of, crawl_oracle  # noqa: E402


def wave_values() -> str:
    pages = {p["url"]: p for p in corpus.local_pages(500, 8)}
    seed = corpus.url_of(0, 8)
    aset = accept_ops.build_accept_set(
        [seed], [f"host{i}.example" for i in range(8)]
    )
    seen: set[tuple[str, str]] = set()
    out = []
    for l in _links_of(pages[seed], seed, 0):
        if l["url"] == seed or (seed, l["url"]) in seen:
            continue
        seen.add((seed, l["url"]))
        ok, _ = accept_ops.accept_link(
            l["url"], 1, l["is_resource"], l["is_redirect"], aset, 100
        )
        if ok:
            out.append(
                f"  ('{l['url']}', 1::BIGINT, {str(l['is_resource']).lower()}, "
                f"{str(l['is_redirect']).lower()}, '{urlops.url_hash(l['url'])}')"
            )
    return ",\n".join(out)


def emission_values() -> str:
    pages = {p["url"]: p for p in corpus.local_pages(500, 8)}
    seed = corpus.url_of(0, 8)
    aset = accept_ops.build_accept_set(
        [seed], [f"host{i}.example" for i in range(8)]
    )
    res = crawl_oracle(pages, [seed], aset, max_docs=60, wave_budget=20)
    return ",\n".join(
        f"  ({i}, '{u}', '{urlops.url_hash(u)}')"
        for i, u in enumerate(res.emitted)
    )


if __name__ == "__main__":
    print("-- crawl_wave VALUES --")
    print(wave_values())
    print("-- crawl_emission VALUES --")
    print(emission_values())
