"""Shared Arrow-UDF plumbing: bounded batch emission for mapInPandas
generators (sources/warc.py, operators/sitemap.py). One place owns the
buffering policy so a change (e.g. byte-capped batches) lands everywhere."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd


def emit_batches(
    rows: Iterable, cols: list[str], batch_rows: int
) -> Iterator[pd.DataFrame]:
    """Yield ``batch_rows``-row DataFrames from a row iterator (rows may be
    dicts or tuples matching ``cols``); the tail flushes whatever is left.
    Bounds executor memory to one batch regardless of input size."""
    buf: list = []
    for r in rows:
        buf.append(r)
        if len(buf) >= batch_rows:
            yield pd.DataFrame(buf, columns=cols)
            buf = []
    if buf:
        yield pd.DataFrame(buf, columns=cols)
