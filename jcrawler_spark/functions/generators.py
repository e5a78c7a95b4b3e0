"""Seed-URL pattern generators (SURVEY.md §2.1 S1-S4).

Re-implements the observable grammar of the reference's Generators
(/root/reference/src/main/java/org/raisercostin/jcrawler/Generators.java:40-159):

  pattern  := (text? '{' internal '}')* text?
  internal := range | alternatives
  range    := number '-' number          -> expands to number sequence
  alts     := alt ('|' alt)*             -> empty alternative allowed

Unmatched braces pass through literally (GeneratorsTest.java:13-14,24:
"a{baubau" -> "a{baubau"; "abaubau}" -> "abaubau}"; "b{1-3}c{d" ->
"b1c{d,..."). Expansion order is the cartesian product in left-to-right
segment order (GeneratorsTest.java:35-51).

Seed lists are tiny, so this is a driver-side pure-Python parser; the
expanded list becomes a DataFrame via createDataFrame (SURVEY S1-S5).
For huge ranges use `range_seeds` which expands Spark-side.
"""

from __future__ import annotations

import re
from itertools import product

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEGMENT = re.compile(r"(?P<before>[^{]*)(?:\{(?P<internal>[^}]*)\}|(?P<end>.*$))", re.DOTALL)
_RANGE = re.compile(r"(\d+)-(\d+)")


def _parse_internal(internal: str) -> list[str]:
    m = _RANGE.search(internal)
    if m:
        start, end = int(m.group(1)), int(m.group(2))
        return [str(i) for i in range(start, end + 1)]
    # alternatives; a trailing/leading '|' yields an empty alternative
    # ("foo{bar|}zar" -> foobarzar, foozar; GeneratorsTest.java:54-56)
    return internal.split("|")


def parse(pattern: str) -> list[list[str]]:
    """Parse into a list of segments, each a list of alternatives."""
    segments: list[list[str]] = []
    pos = 0
    n = len(pattern)
    while pos <= n:
        m = _SEGMENT.match(pattern, pos)
        if m is None:
            break
        segments.append([m.group("before")])
        internal = m.group("internal")
        if internal is not None:
            segments.append(_parse_internal(internal))
        end = m.group("end")
        if end is not None:
            segments.append([end])
        if m.end() == pos:
            break
        pos = m.end()
        if end is not None:
            break
    return segments


def generate(pattern: str) -> list[str]:
    """Expand a seed pattern into the full combination list, in the
    documented cartesian order (GeneratorsTest.java:35-51)."""
    segments = parse(pattern)
    if not segments:
        return [pattern]
    return ["".join(combo) for combo in product(*segments)]


def generate_all(patterns: list[str]) -> list[str]:
    """flatMap over patterns, preserving order (JCrawler.java:710)."""
    out: list[str] = []
    for p in patterns:
        out.extend(generate(p))
    return out


def range_seeds(
    spark: SparkSession, template: str, start: int, end: int
) -> DataFrame:
    """Spark-native large-range variant of the RangeGenerator
    (Generators.java:115-128): expands `template.format(i)` for
    i in [start, end] distributed via spark.range — for seed lists too big
    for the driver."""
    return spark.range(start, end + 1).select(
        F.format_string(template.replace("%s", "%d"), F.col("id")).alias("url")
    )
