"""Deterministic HTML → text extractor.

The north rule's per-row invariant ("byte-identical extracted text per
url", BASELINE.json ``input_hint``) is defined against THIS function run
single-process — the reference repo contains no extractor (it is a pure
numeric sketch, see BASELINE.md), so this pure function is the spec, and
the distributed pipeline must reproduce it byte-for-byte.

Determinism requirements honored here:
- pure function of the input bytes only (no locale, no time, no ML);
- fixed utf-8 decode with errors="replace";
- a fixed, ordered entity table (named entities only);
- ASCII-and-unicode whitespace collapse via a single compiled regex.

The per-batch driver (``extract_batch``) is the map_batches body; regexes
are compiled once at module import (per worker process), so stateless
tasks and actor pools both amortize setup.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# script/style blocks go first (their content is not text) — non-greedy to
# the matching close tag; malformed/unclosed blocks fall through to tag strip
_SCRIPT_STYLE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_COMMENT = re.compile(r"<!--.*?-->", re.S)
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
    "&copy;": "©",
}
_ENT_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))


def extract_text(html) -> str:
    """bytes|str HTML → plain text. Pure and deterministic."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = str(html)
    s = _COMMENT.sub(" ", s)
    s = _SCRIPT_STYLE.sub(" ", s)
    s = _TAG.sub(" ", s)
    s = _ENT_RE.sub(lambda m: _ENTITIES[m.group(0)], s)
    return _WS.sub(" ", s).strip()


def extract_batch(batch: pa.Table, html_col: str = "html", out_col: str = "text_extracted") -> pa.Table:
    """map_batches body: adds ``out_col`` (string) extracted from ``html_col``.

    Row-wise Python loop, but each row's work is C-regex over a large
    string, so the loop overhead is noise; the batch stays Arrow-native.
    """
    htmls = batch.column(html_col).to_pylist()
    texts = [extract_text(h) for h in htmls]
    return batch.append_column(out_col, pa.array(texts, type=pa.string()))


def text_lengths_batch(
    batch: pa.Table,
    text_col: str = "text",
    html_col: str = "html",
) -> pa.Table:
    """Adds int64 byte-length columns (text_len, html_len) — the sketch
    pipeline's derive step, fully vectorized via pyarrow.compute."""
    import pyarrow.compute as pc

    out = batch
    if text_col in batch.column_names:
        out = out.append_column(
            "text_len", pc.cast(pc.binary_length(out.column(text_col)), pa.int64())
        )
    if html_col in batch.column_names:
        out = out.append_column(
            "html_len", pc.cast(pc.binary_length(out.column(html_col)), pa.int64())
        )
    return out
