"""HTML strip char filter — index web pages from raw ``html`` bytes.

The reference's char-filter stage runs BEFORE the tokenizer
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/
HTMLStripCharFilter.java``; wired via ``Analyzer.initReader``,
``core/analysis/Analyzer.java:330-345``). Clean-room semantics:

- comments, ``<script>``/``<style>`` elements (including content),
  DOCTYPE and processing instructions are removed entirely;
- ``<![CDATA[...]]>`` keeps its character content;
- every remaining tag is replaced by ONE space. (The reference deletes
  tags and fixes offsets instead; the space substitution is this
  engine's documented divergence — it keeps adjacent words from fusing
  into one token without carrying an offset-correction map, and is
  token-equivalent for ranking.)
- character entities decode last (``&amp;`` → ``&``, numeric forms too),
  via the stdlib's full HTML5 named-entity table.

Input may be ``bytes`` (the ``html:binary`` column of a pages corpus —
the north rule's input shape); it is decoded as UTF-8 with replacement
before filtering, so a binary column can be an index's ``text_col``.
"""

from __future__ import annotations

import html as _html
import re
from typing import Callable, Dict, Sequence, Tuple, Union

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_SCRIPT = re.compile(r"<script\b.*?(?:</script\s*>|$)", re.S | re.I)
_STYLE = re.compile(r"<style\b.*?(?:</style\s*>|$)", re.S | re.I)
_CDATA = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.S)
_TAG = re.compile(r"<[^>]*>")


def html_strip(text: Union[str, bytes, None]) -> str:
    if text is None:
        return ""
    if isinstance(text, (bytes, bytearray, memoryview)):
        text = bytes(text).decode("utf-8", errors="replace")
    text = _COMMENT.sub(" ", text)
    text = _SCRIPT.sub(" ", text)
    text = _STYLE.sub(" ", text)
    text = _CDATA.sub(r"\1", text)
    text = _TAG.sub(" ", text)
    return _html.unescape(text)


# char-filter SPI: registry-by-name keeps IndexConfig JSON-serializable
# (the CharFilterFactory NAME lookup role,
# ``lucene/analysis/common/.../charfilter/HTMLStripCharFilterFactory.java``)
CHAR_FILTERS: Dict[str, Callable[[Union[str, bytes, None]], str]] = {
    "html_strip": html_strip,
}


def resolve_char_filters(names: Sequence[str]) -> Tuple[Callable, ...]:
    out = []
    for n in names:
        if n not in CHAR_FILTERS:
            raise ValueError(
                f"unknown char filter {n!r}; known: {sorted(CHAR_FILTERS)}"
            )
        out.append(CHAR_FILTERS[n])
    return tuple(out)
