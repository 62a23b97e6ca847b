"""The pinned HTML→text extractor (per-row invariant).

BASELINE.json input_hint requires extracted ``text`` to be
byte-identical per ``url`` against the reference extractor.  The
reference repo has no text extractor (it is a raster engine); per
SURVEY.md §7.2-1 the pinned extractor IS this function — it is the
single source of truth, used (a) as the single-node oracle that
freezes the golden ``(url, sha256(text))`` parquet and (b) inside the
vectorized pandas UDF — byte-identical by construction, guarded by
tests/test_extract.py.

Deliberately dependency-free (no lxml/bs4 whose versions change
output): a small deterministic state machine + `html.unescape` from
the stdlib, with whitespace canonicalization.
"""

from __future__ import annotations

import hashlib
import html as _html
import re

# drop these elements with their content
_DROP_CONTENT = re.compile(
    r"<(script|style|noscript|template|svg|head)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
# block-level tags become newlines so paragraphs stay separated
_BLOCK_TAG = re.compile(
    r"</?(p|div|br|h[1-6]|li|ul|ol|tr|table|section|article|header|footer|"
    r"blockquote|pre|hr|title|body|html)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]+>")
_SPACES = re.compile(r"[ \t\r\f\v]+")
_NEWLINES = re.compile(r"\n{2,}")


def extract_text(html_bytes: bytes | str) -> str:
    """Deterministic main-text extraction.

    Output canonical form: UTF-8 text; runs of spaces/tabs collapsed
    to one space; block boundaries collapsed to single ``\\n``; no
    leading/trailing whitespace per line or document.
    """
    if isinstance(html_bytes, (bytes, bytearray)):
        s = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        s = html_bytes
    s = _COMMENT.sub(" ", s)
    s = _DROP_CONTENT.sub(" ", s)
    s = _BLOCK_TAG.sub("\n", s)
    s = _ANY_TAG.sub(" ", s)
    s = _html.unescape(s)
    s = _SPACES.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    s = "\n".join(lines)
    s = _NEWLINES.sub("\n", s)
    return s.strip()


def text_sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
