"""HTML normalization — the JScraper ``jsoupCleanDocument`` analogue.

The reference normalizes a crawled page by parsing with Jsoup and
re-serializing with pretty-print on, 2-space indent, UTF-8, xhtml escape
mode (/root/reference/src/main/java/org/raisercostin/jscraper/
JScraper.java:101-126); the ``.jsoup.html`` companion file feeds
mirror-diff workflows. This module is the deterministic stdlib
re-expression (html.parser — no Jsoup in Python): the OUTPUT GRAMMAR is
pinned here (and by goldens), not byte-identical to Jsoup, but serves the
same purpose — two crawls of semantically identical markup normalize to
identical bytes, so a text diff shows real changes only.

Canonical form:
  * tag and attribute names lowercased; attributes kept in source order,
    always double-quoted, values xhtml-escaped (&<>" and ');
  * an ``<html><head/><body/>`` skeleton is guaranteed (Jsoup implies it);
  * block-level elements are pretty-printed at 2-space indent;
    inline markup and text stay on the line, runs of whitespace collapse
    to one space (Jsoup prettyPrint semantics);
  * contents of <pre>/<script>/<style>/<textarea> are preserved verbatim;
  * void elements serialize self-closed (``<br />`` — xhtml mode);
  * comments and doctype are preserved; entities are decoded on parse and
    re-escaped on output, so ``&nbsp;``/``&#160;`` unify.

Spark surface: ``normalize_html_udf`` is an Arrow pandas_udf (one of the
repo's declared Python-UDF surfaces — per-row string rewriting has no
Column-expression form). Scale: embarrassingly parallel map, no shuffle.
"""

from __future__ import annotations

import re
from html import escape
from html.parser import HTMLParser

# any whitespace run (incl NBSP — entities were decoded on parse) → one space
_WS = re.compile(r"\s+")

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
RAW_TEXT = frozenset("pre script style textarea".split())
# block-level: rendered one-per-line at their depth (Jsoup's isBlock set,
# trimmed to the common HTML set)
BLOCK = frozenset(
    """html head body frameset script noscript style meta link title frame
    noframes section nav aside hgroup header footer p h1 h2 h3 h4 h5 h6
    ul ol pre div blockquote hr address figure figcaption form fieldset
    ins del dl dt dd li table caption thead tfoot tbody colgroup col tr th
    td video audio canvas details menu plaintext template article main
    svg math center col template dir applet marquee map""".split()
)


class _Node:
    __slots__ = ("tag", "attrs", "children", "text", "kind")

    def __init__(self, kind: str, tag: str = "", attrs=None, text: str = ""):
        self.kind = kind  # element | text | comment | decl
        self.tag = tag
        self.attrs = attrs or []
        self.children: list[_Node] = []
        self.text = text


class _TreeBuilder(HTMLParser):
    """Tolerant tree builder: unclosed tags close implicitly when an
    ancestor closes; stray close tags are ignored (Jsoup tolerance)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("element", "#root")
        self.stack = [self.root]
        self.doctype: str | None = None

    def handle_decl(self, decl: str) -> None:
        self.doctype = decl

    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        node = _Node(
            "element", tag, [(k.lower(), v if v is not None else "") for k, v in attrs]
        )
        self.stack[-1].children.append(node)
        if tag not in VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        self.stack[-1].children.append(
            _Node(
                "element", tag,
                [(k.lower(), v if v is not None else "") for k, v in attrs],
            )
        )

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in VOID:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray close tag: ignored

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(_Node("text", text=data))

    def handle_comment(self, data: str) -> None:
        self.stack[-1].children.append(_Node("comment", text=data))


def _ensure_skeleton(root: _Node) -> _Node:
    """Guarantee the html>head+body document shape (Jsoup implies it)."""
    html = next(
        (c for c in root.children if c.kind == "element" and c.tag == "html"),
        None,
    )
    if html is None:
        html = _Node("element", "html")
        html.children = list(root.children)
        root.children = [html]
    head = next(
        (c for c in html.children if c.kind == "element" and c.tag == "head"),
        None,
    )
    body = next(
        (c for c in html.children if c.kind == "element" and c.tag == "body"),
        None,
    )
    if head is None or body is None:
        head_tags = frozenset("title meta link base style script".split())
        new_head = head or _Node("element", "head")
        new_body = body or _Node("element", "body")
        for c in html.children:
            if c is head or c is body:
                continue
            # Every stray sibling is rehomed (never dropped): head-only
            # elements into the head, content into the body — whichever of
            # the two is synthesized vs pre-existing (Jsoup does the same
            # rehoming when it implies the skeleton).
            if c.kind == "element" and c.tag in head_tags:
                new_head.children.append(c)
            elif not (c.kind == "text" and not c.text.strip()):
                new_body.children.append(c)
        html.children = [new_head, new_body]
    return root


def _esc_text(s: str) -> str:
    return escape(s, quote=False)


def _esc_attr(s: str) -> str:
    return escape(s, quote=True)


def _open_tag(n: _Node, close: bool) -> str:
    attrs = "".join(f' {k}="{_esc_attr(v)}"' for k, v in n.attrs)
    return f"<{n.tag}{attrs}{' /' if close else ''}>"


def _is_blockish(n: _Node) -> bool:
    return n.kind in ("comment",) or (n.kind == "element" and n.tag in BLOCK)


def _serialize(n: _Node, out: list[str], depth: int) -> None:
    pad = "  " * depth
    if n.kind == "comment":
        out.append(f"{pad}<!--{n.text}-->")
        return
    if n.kind == "text":
        t = " ".join(n.text.split())
        if t:
            out.append(f"{pad}{_esc_text(t)}")
        return
    if n.tag in VOID:
        out.append(f"{pad}{_open_tag(n, close=True)}")
        return
    if n.tag in RAW_TEXT:
        raw = "".join(c.text for c in n.children if c.kind == "text")
        if raw.strip():
            out.append(f"{pad}{_open_tag(n, False)}{raw}</{n.tag}>")
        else:
            out.append(f"{pad}{_open_tag(n, False)}</{n.tag}>")
        return
    kids = [
        c for c in n.children
        if not (c.kind == "text" and not c.text.strip())
    ]
    if not kids:
        out.append(f"{pad}{_open_tag(n, False)}</{n.tag}>")
        return
    if any(_is_blockish(c) for c in kids):
        # block layout: children each on their own line
        out.append(f"{pad}{_open_tag(n, False)}")
        for c in kids:
            _serialize(c, out, depth + 1)
        out.append(f"{pad}</{n.tag}>")
    else:
        # inline-only content: single line; whitespace runs collapse to one
        # space, boundary spaces BETWEEN inline siblings survive (a space
        # between text and <b>…</b> is rendered content — Jsoup keeps it),
        # the line's own ends are trimmed
        body = "".join(_inline(c) for c in n.children).strip()
        out.append(f"{pad}{_open_tag(n, False)}{body}</{n.tag}>")


def _inline(n: _Node) -> str:
    if n.kind == "text":
        return _esc_text(_WS.sub(" ", n.text))
    if n.kind == "comment":
        return f"<!--{n.text}-->"
    if n.tag in VOID:
        return _open_tag(n, close=True)
    if n.tag in RAW_TEXT:
        raw = "".join(c.text for c in n.children if c.kind == "text")
        return f"{_open_tag(n, False)}{raw}</{n.tag}>"
    inner = "".join(_inline(c) for c in n.children)
    return f"{_open_tag(n, False)}{inner}</{n.tag}>"


def normalize_html(html: str | None) -> str | None:
    """Canonicalize one HTML document (see module docstring)."""
    if html is None:
        return None
    p = _TreeBuilder()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return html  # pathological markup: pass through untouched (loud no-op)
    root = _ensure_skeleton(p.root)
    out: list[str] = []
    if p.doctype is not None:
        out.append(f"<!{p.doctype.lower()}>")
    for c in root.children:
        _serialize(c, out, 0)
    return "\n".join(out) + "\n"


@F.pandas_udf(T.StringType())
def normalize_html_udf(html: pd.Series) -> pd.Series:
    return html.map(normalize_html)


def normalize_html_col(html: Column | str) -> Column:
    """Column form: decode binary bodies as UTF-8 (replacement chars on
    invalid bytes — the reference reads content as UTF-8 too) and
    normalize. Use over pages.html or any string column."""
    c = F.col(html) if isinstance(html, str) else html
    return normalize_html_udf(
        F.when(c.isNotNull(), c.cast("string")).otherwise(F.lit(None))
    )
