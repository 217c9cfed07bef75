"""HTML → text extraction (stage EXTRACT).

The per-row invariant (BASELINE.json ``input_hint``): ``extract_text(html)``
is a *pure function of the html bytes* and must reproduce the stored ``text``
column byte-for-byte. The reference's analogous step is the PubTator parse
that concatenates title + ' ' + abstract (`/root/reference/el_data_formatter.py:7-41`);
we generalize to Common-Crawl-style HTML pages.

Implementation: a deterministic, dependency-free tag stripper —
block-level boundaries (title/p/br/div/li/h1..h6/tr) become newlines, scripts
and styles are dropped, remaining tags are removed, HTML entities are
unescaped, and horizontal whitespace is collapsed within lines. No locale,
charset sniffing, or wall-clock dependence: input is decoded strictly as
UTF-8 (errors='replace' keeps the function total and deterministic).

Exposed both as a plain Python function (for generation/tests) and as an
Arrow-batched pandas UDF (the engine's hot path — never per-row Python).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_RE = re.compile(
    r"</?(?:title|p|br|div|li|ul|ol|h[1-6]|tr|table|head|body|html)\b[^>]*/?>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]*>")
_HSPACE_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html_bytes: bytes | bytearray | memoryview | str | None) -> str:
    """Pure html-bytes → text. Deterministic; no I/O, no locale, no clock."""
    if html_bytes is None:
        return ""
    if isinstance(html_bytes, str):
        raw = html_bytes
    else:
        raw = bytes(html_bytes).decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", raw)
    s = _SCRIPT_RE.sub("", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _HSPACE_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched vectorized wrapper around :func:`extract_text`."""
    return html.map(extract_text)


def extract_documents(pages):
    """pages(url, warc_ts, html, text, lang) → documents(document_id, text).

    Column-pruned: only ``url`` and ``html`` are read from the scan
    (Catalyst drops the stored ``text`` — it is the *oracle* for the
    invariant test, never an engine input). document_id = url, mirroring
    the reference documents.json schema (`/root/reference/el_data_formatter.py:69-73`).
    """
    return pages.select(
        F.col("url").alias("document_id"),
        extract_text_udf(F.col("html")).alias("text"),
    )
