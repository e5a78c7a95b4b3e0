"""jcrawler_spark — a PySpark-native batch-iterative web-crawler analytics engine.

A from-scratch re-expression of the observable dataflow semantics of the
reference crawler (raisercostin/jcrawler, a single-JVM Java crawler) as a
superstep loop over Spark DataFrames:

    seed -> [wave select -> fetch-join -> extract links (Arrow UDF)
             -> filter -> dedup -> frontier append]* -> emitted crawl order

The architecture is Spark-first (DataFrame/Catalyst, vectorized pandas UDFs
only for the HTML work), NOT a port of the reference's thread-pool engine.
Reference file:line citations appear in docstrings so behavior parity can be
audited; no reference code is copied.
"""

__version__ = "0.1.0"

from jcrawler_spark.config import CrawlConfig

__all__ = ["CrawlConfig"]
