"""HTML link + text extraction (Arrow-vectorized).

Reference analogues:
  - link extraction <- GetConnections peer-list fetch + discovered-peer
    filter (crawler/rpc/rpc.go:62-86, crawler/crawling/crawler.go:73-77);
    the reference's "links" are closest-peer IDs, ours are <a href> targets.
  - text extraction <- GetItems/GetProfile payload decode
    (crawler/rpc/rpc.go:89-147); input_hint requires the extracted text to
    be byte-identical per url, so ``extract_text`` is a deterministic pure
    function shared by the fixture generator (golden column) and the UDF.

Both UDFs are pandas UDFs over the raw ``html BINARY`` column — per-batch
Arrow transfer, vectorized regex via pandas .str where possible.
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"'<>\s]+)["']""", re.IGNORECASE)
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_links(html_bytes: bytes | None) -> list[str]:
    """All href targets in document order (pure function; oracle impl)."""
    if html_bytes is None:
        return []
    try:
        doc = html_bytes.decode("utf-8", errors="replace")
    except Exception:
        return []
    return _HREF_RE.findall(doc)


def extract_text(html_bytes: bytes | None) -> str | None:
    """Deterministic text extraction — the byte-identical invariant.

    Pipeline: utf-8 decode (replace) -> drop <script>/<style> subtrees ->
    tags -> single space -> HTML entity unescape -> collapse whitespace ->
    strip. Every step is order-fixed so output is a pure function of input.
    """
    if html_bytes is None:
        return None
    doc = html_bytes.decode("utf-8", errors="replace")
    doc = _SCRIPT_STYLE_RE.sub(" ", doc)
    doc = _TAG_RE.sub(" ", doc)
    doc = _htmllib.unescape(doc)
    # " ".join(split()) == _WS_RE.sub(" ", doc).strip() byte-for-byte
    # (str.split() and regex \s agree on unicode whitespace; verified over
    # an adversarial corpus) but is ~4x faster — this step was the UDF's
    # single hottest line (4.1k docs/s vs 60k+/s for every other step).
    return " ".join(doc.split())


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    # bytes -> str once per batch, then a single vectorized findall
    docs = html.map(
        lambda b: b.decode("utf-8", errors="replace") if b is not None else ""
    )
    return docs.str.findall(_HREF_RE)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text, na_action="ignore")


_HARVEST_TYPE = T.StructType(
    [
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("text", T.StringType()),
    ]
)


@F.pandas_udf(_HARVEST_TYPE)
def extract_links_and_text_udf(html: pd.Series) -> pd.DataFrame:
    """Single-pass harvest: links + text from ONE Arrow transfer of html.

    Two separate UDFs would ship and utf-8-decode the (heavy) html column
    to Python twice — on a 600k x 12 KB wave that's ~16 GB of duplicated
    Arrow traffic. One struct-returning UDF halves it.
    """
    links, texts = [], []
    for b in html:
        if b is None:
            links.append([])
            texts.append(None)
            continue
        doc = b.decode("utf-8", errors="replace")
        links.append(_HREF_RE.findall(doc))
        doc = _SCRIPT_STYLE_RE.sub(" ", doc)
        doc = _TAG_RE.sub(" ", doc)
        doc = _htmllib.unescape(doc)
        texts.append(" ".join(doc.split()))  # == _WS_RE.sub+strip, ~4x faster
    return pd.DataFrame({"links": links, "text": texts})


@F.pandas_udf(_HARVEST_TYPE)
def extract_canonical_links_and_text_udf(html: pd.Series) -> pd.DataFrame:
    """Single-pass harvest with links CANONICALIZED in the same Python
    visit (invalid urls dropped).

    Why: the spill path previously extracted raw links here, wrote them,
    and then the frontier-merge job shipped every exploded link (Zipf
    corpora: ~10x the page count) through a SECOND ArrowEvalPython stage
    just to run canonicalize_url. The links are already Python strings in
    this loop — canonicalizing here deletes that entire Arrow round trip
    from the merge job. Byte-identical by construction: same
    canonicalize_url pure function (functions/urls.py), equality with the
    two-stage path asserted in tests/test_extract.py."""
    from .urls import canonicalize_url

    links, texts = [], []
    for b in html:
        if b is None:
            links.append([])
            texts.append(None)
            continue
        doc = b.decode("utf-8", errors="replace")
        links.append(
            [c for l in _HREF_RE.findall(doc) if (c := canonicalize_url(l)) is not None]
        )
        doc = _SCRIPT_STYLE_RE.sub(" ", doc)
        doc = _TAG_RE.sub(" ", doc)
        doc = _htmllib.unescape(doc)
        texts.append(" ".join(doc.split()))
    return pd.DataFrame({"links": links, "text": texts})


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_canonical_links_udf(html: pd.Series) -> pd.Series:
    """Links-only variant of extract_canonical_links_and_text_udf (the
    spill path without document extraction)."""
    from .urls import canonicalize_url

    out = []
    for b in html:
        if b is None:
            out.append([])
            continue
        doc = b.decode("utf-8", errors="replace")
        out.append(
            [c for l in _HREF_RE.findall(doc) if (c := canonicalize_url(l)) is not None]
        )
    return pd.Series(out)


def links_from_pages(pages_df, url_col: str = "url"):
    """pages -> (src_url, link) exploded edge list.

    The UDTF analogue of the reference's GetConnections fan-out
    (crawler/rpc/rpc.go:62-86): one row per outgoing link.
    """
    return pages_df.select(
        F.col(url_col).alias("src_url"),
        F.explode(extract_links_udf(F.col("html"))).alias("link"),
    )
