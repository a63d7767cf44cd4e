"""X1 — deterministic HTML→text extraction (Arrow-vectorized pandas UDF).

The reference never extracts text (documents arrive pre-built as JSON); the
north rule requires a byte-identical-per-url extractor as the first stage
of the index build. The extraction *spec* is frozen here — pure stdlib, no
version-floating parser libs — so the output bytes are a pure function of
the input bytes:

  1. UTF-8 decode (errors="replace")
  2. drop <script>…</script>, <style>…</style> blocks and <!-- comments -->
  3. replace every remaining tag with a single space
  4. decode HTML entities (html.unescape, after tag-strip so encoded
     angle brackets can't create fake tags)
  5. collapse all Unicode whitespace runs to single spaces, strip ends

Runs as an Arrow-batched pandas UDF over the binary ``html`` column —
no per-row Python at the plan level; regex work is batched per Arrow
record batch (spark.sql.execution.arrow.maxRecordsPerBatch).

Reference parity: replaces the document-body passthrough of
BulkAction.kt:243-295 (JsonSource/ProtobufSource) with a real extractor.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SCRIPT_RE = re.compile(r"(?is)<script\b.*?</script\s*>")
_STYLE_RE = re.compile(r"(?is)<style\b.*?</style\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"<[^>]*>")


def extract_text_py(html_bytes: bytes | None) -> str:
    """The frozen extraction spec, one document. Deterministic."""
    if html_bytes is None:
        return ""
    s = bytes(html_bytes).decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return " ".join(s.split())


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(extract_text_py)
