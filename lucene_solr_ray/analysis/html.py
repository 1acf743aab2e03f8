"""HTMLStripCharFilter analog: vectorized HTML → text char filtering.

From-scratch re-creation of the semantics of Lucene's HTMLStripCharFilter
(reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
charfilter/HTMLStripCharFilter.java — a ~31k-line generated JFlex scanner,
branch_8x; SURVEY.md §2.1, where it was previously scoped out because the
corpus `text` column is the source of truth). Implemented as a chain of
RE2 kernels over whole Arrow string columns (`pc.replace_substring_regex`)
plus an HTML5 entity decode, so the batch path never touches per-row
Python except on the (masked) subset of rows that still carry entities
after tag removal.

Semantics re-created:
- ``<script>``/``<style>`` elements are removed INCLUDING their content;
  comments, DOCTYPE declarations and processing instructions are removed.
- Inline-element tags (the reference's ``a b i em strong span …`` set)
  are deleted without a separator — ``<b>bold</b>face`` → ``boldface`` —
  while every other tag becomes one space (block boundaries must not glue
  words together: ``one<p>two`` → ``one two``).
- Character entities decode per HTML5 (named + decimal + hex numeric) via
  the stdlib ``html.unescape`` table — the same outcome as the
  reference's generated entity map for every well-formed reference.

Documented deviations (all JFlex-scanner edge states, pinned by tests):
no offset correction (we never need corrected offsets — analysis is
whole-string), attribute values containing a raw ``>`` inside quotes end
the tag early, an unterminated ``<script>`` leaves its text (the
reference drops the rest of the document), and the ``escapedTags`` option
is not supported.

The pattern/replacement chain is exported (``REPLACEMENTS``) because the
``html_strip_docs`` oracle builds its DuckDB ``regexp_replace`` chain from
the SAME strings — DuckDB is RE2-backed too, so engine and oracle share
one definition of the transform.
"""

from __future__ import annotations

import html as _htmllib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "REPLACEMENTS", "html_strip", "html_strip_array",
    "decode_entities_array", "build_char_filter_chain",
]

# the reference's inline elements (HTMLStripCharFilter.java: the
# InlineElments set) — removed with no separator; everything else becomes
# one space
_INLINE = (
    "a|abbr|acronym|b|basefont|bdo|big|cite|code|dfn|em|font|i|img|input|"
    "kbd|label|q|s|samp|select|small|span|strike|strong|sub|sup|textarea|"
    "tt|u|var"
)

# ordered (pattern, replacement) chain — RE2 syntax, valid verbatim in
# pyarrow.compute AND DuckDB regexp_replace(..., 'g'). Content-bearing
# elements and comments first (their bodies may contain '<'), then the
# tag sweeps.
REPLACEMENTS = (
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<!doctype[^>]*>", " "),
    (r"(?s)<\?.*?\?>", " "),
    (rf"(?is)</?(?:{_INLINE})(?:\s[^>]*|/)?>", ""),
    (r"(?s)</?[a-zA-Z!][^>]*>", " "),
)


def decode_entities_array(arr: pa.Array) -> pa.Array:
    """HTML5 entity decode over a string column. Only rows containing an
    ``&`` leave Arrow: they run through ``html.unescape`` (named + numeric
    forms, the full W3C table) and are scattered back; entity-free rows
    are untouched zero-copy."""
    mask = pc.fill_null(pc.match_substring(arr, "&"), False)
    if not pc.any(mask).as_py():
        return arr
    idx = np.nonzero(np.asarray(mask))[0]
    sub = arr.take(pa.array(idx))
    dec = pa.array(
        [_htmllib.unescape(v) for v in sub.to_pylist()], type=pa.string()
    )
    return pc.replace_with_mask(arr, mask, dec)


def html_strip_array(arr) -> pa.Array:
    """Vectorized HTML → text over a string or binary (UTF-8) column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = pc.cast(arr, pa.string())
    for pat, repl in REPLACEMENTS:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
    return decode_entities_array(arr)


def html_strip(text: str) -> str:
    """Scalar convenience twin of :func:`html_strip_array`."""
    if text is None:
        return None
    return html_strip_array(pa.array([text], type=pa.string()))[0].as_py()


# --- char-filter SPI ---------------------------------------------------------
# mirrors analysis/filters.py#FILTER_BUILDERS: name → builder(args) →
# (pa.Array → pa.Array). Char filters run over the raw text BEFORE
# tokenization (Lucene's CharFilter slot in the analyzer chain).
CHAR_FILTER_BUILDERS = {
    "html_strip": lambda args: html_strip_array,
}


def build_char_filter_chain(spec_char_filters):
    """Compose an analyzer spec's ``char_filters`` list into one
    ``pa.Array -> pa.Array`` callable (None when the list is empty).
    Unknown names raise — a misspelled spec must not silently no-op."""
    fns = []
    for entry in spec_char_filters or ():
        if isinstance(entry, str):
            name, args = entry, {}
        else:
            args = dict(entry)
            name = args.pop("name", None)
        builder = CHAR_FILTER_BUILDERS.get(name)
        if builder is None:
            raise ValueError(f"unknown char filter: {name!r}")
        fns.append(builder(args))
    if not fns:
        return None
    if len(fns) == 1:
        return fns[0]

    def chain(arr):
        for f in fns:
            arr = f(arr)
        return arr

    return chain
