"""S14 content decompression (SURVEY.md §2.1; JCrawler.decompressStream,
/root/reference/src/main/java/org/raisercostin/jcrawler/JCrawler.java:790-821).

gzip/deflate via stdlib; brotli/zstd gated behind import (absent in this
container — calls raise a clear error, matching the stub policy). Pure
forms + one Arrow-batch UDF; the encoding↔extension maps mirror
getExtensionForEncoding / getEncodingForExtension (JCrawler.java:803-827).
"""

from __future__ import annotations

import gzip
import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - absent in this environment
    import brotli  # type: ignore
except ImportError:
    brotli = None
try:  # pragma: no cover
    import zstandard  # type: ignore
except ImportError:
    zstandard = None

ENCODING_TO_EXT = {"gzip": ".gz", "deflate": ".deflate", "br": ".br", "zstd": ".zst"}
EXT_TO_ENCODING = {v: k for k, v in ENCODING_TO_EXT.items()}


def extension_for_encoding(encoding: str | None) -> str:
    """JCrawler.getExtensionForEncoding: unknown/identity → ''."""
    if not encoding:
        return ""
    return ENCODING_TO_EXT.get(encoding.strip().lower(), "")


def encoding_for_extension(ext: str) -> str | None:
    return EXT_TO_ENCODING.get(ext.lower())


def decompress(data: bytes, encoding: str | None) -> bytes:
    """decompressStream semantics: dispatch on Content-Encoding; identity /
    unknown encodings pass through untouched."""
    if not data or not encoding:
        return data
    enc = encoding.strip().lower()
    if enc == "gzip":
        return gzip.decompress(data)
    if enc == "deflate":
        try:
            return zlib.decompress(data)
        except zlib.error:
            return zlib.decompress(data, -zlib.MAX_WBITS)  # raw deflate
    if enc == "br":
        if brotli is None:
            raise NotImplementedError("brotli not available in this environment")
        return brotli.decompress(data)
    if enc == "zstd":
        if zstandard is None:
            raise NotImplementedError("zstandard not available in this environment")
        return zstandard.ZstdDecompressor().decompress(data)
    return data


# DataType object, not a DDL string: string types parse at decoration time
# and would require an active SparkSession at import
@F.pandas_udf(T.BinaryType())
def decompress_udf(data: pd.Series, encoding: pd.Series) -> pd.Series:
    """Arrow-batch body decode (per-batch Python, not per-row across the
    cluster boundary)."""
    return pd.Series(
        [
            decompress(bytes(d) if d is not None else b"", e)
            for d, e in zip(data, encoding)
        ]
    )


def content_encoding_col(response_headers: Column) -> Column:
    """getEncoding(meta): first Content-Encoding header
    (JCrawler.java:829-833) from a map<string,string> column."""
    return F.coalesce(
        response_headers.getItem("Content-Encoding"),
        response_headers.getItem("content-encoding"),
    )
