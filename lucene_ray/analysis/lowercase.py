"""Per-codepoint *simple* lowercase, matching ``Character.toLowerCase(int)``.

Reference semantics: ``LowerCaseFilter`` lowercases each codepoint with
Java's ``Character.toLowerCase(int)`` — the Unicode *simple* (1:1)
lowercase mapping, NOT the full case mapping and NOT locale-sensitive
(``lucene/core/src/java/org/apache/lucene/analysis/LowerCaseFilter.java:36-38``,
``.../CharacterUtils.java:53-59``).

Python's ``str.lower()`` applies the *full* mapping, which differs for a
handful of codepoints:

- U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE: full → "i" + U+0307
  (two codepoints); simple → "i".
- U+03A3 GREEK CAPITAL SIGMA in final position: full (string-level) →
  final sigma U+03C2; simple → U+03C3 always.

We emulate the simple mapping by lowercasing each codepoint *in
isolation* (which disables context rules like final sigma) and, when the
full mapping expands to multiple codepoints, keeping only mappings that
are 1:1 (multi-char expansions fall back to the first codepoint when that
codepoint is the base letter, e.g. U+0130 → "i"; otherwise the original
codepoint is kept, matching Java's behavior of "no simple mapping ⇒
unchanged").
"""

from __future__ import annotations


class _SimpleLowerTable(dict):
    """Lazy codepoint→codepoint translation table for ``str.translate``.

    ``str.translate`` consults ``__getitem__`` per codepoint; we compute
    and cache the simple-lowercase mapping on first sight.  Raising
    ``LookupError`` leaves the character unchanged, so we only ever store
    real mappings.
    """

    def __missing__(self, cp: int) -> int:
        ch = chr(cp)
        low = ch.lower()  # isolated codepoint → no context rules
        if low == ch:
            self[cp] = cp
            return cp
        if len(low) == 1:
            out = ord(low)
        else:
            # Full mapping expanded (e.g. U+0130 → "i̇").  Java's
            # simple map takes the base letter when one exists; keep the
            # first codepoint if it is itself a lowercase letter, else
            # leave the input unchanged.
            first = low[0]
            out = ord(first) if first.islower() else cp
        self[cp] = out
        return out


_TABLE = _SimpleLowerTable()


def simple_lowercase(text: str) -> str:
    """Lowercase ``text`` codepoint-by-codepoint with the simple mapping."""
    return text.translate(_TABLE)
