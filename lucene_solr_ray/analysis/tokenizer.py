"""UAX#29-style word tokenizer + codepoint-wise lowercase filter.

From-scratch re-creation of the semantics of Lucene 8.x StandardTokenizer
(reference: lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardTokenizer.java + the generated JFlex UAX#29 grammar, branch_8x) and
LowerCaseFilter (lucene/analysis/common/.../core/LowerCaseFilter.java); see
SURVEY.md §2.2 and Appendix A.4. Implemented directly from the public
UAX#29 word-boundary rules (WB5-WB13) as a compiled regex — no JFlex.

Covered rules:
- runs of letters/digits form one token (WB5, WB8, WB9, WB10);
- MidLetter / MidNumLet / Single_Quote between letters join
  (``can't``, ``I.B.M``, ``foo:bar``) (WB6/WB7);
- MidNum / MidNumLet between digits join (``3.14``, ``1,000``) (WB11/WB12);
- ExtendNumLet ``_`` joins on either side (``foo_bar``) (WB13a/13b);
- Han / Hiragana ideographs emit single-codepoint tokens, Katakana emits
  runs (Lucene's IDEOGRAPHIC/HIRAGANA/KATAKANA token types);
- tokens longer than ``max_token_length`` (default 255, Lucene's default)
  are split into max_token_length-sized chunks, matching the JFlex
  scanner's buffer-split behavior.

Known deviations (documented, pinned by tests): the exotic tails of the
MidLetter/MidNum codepoint sets (vertical presentation forms, Arabic
separators) are reduced to their common members; regional-indicator and
extended-pictographic rules are out of scope (emoji are dropped as
non-word characters, which matches StandardTokenizer's behavior of not
emitting EMOJI-type tokens until Lucene 8.4's default was still word-only
for our slice).

Lowercasing matches ``Character.toLowerCase(int)`` codepoint-wise
semantics: context-insensitive (final sigma Σ→σ always, unlike
``str.lower``'s context-sensitive ς) and 1:1 (İ U+0130 → i, unlike
Python's 2-codepoint expansion).
"""

from __future__ import annotations

import re
from typing import List

__all__ = ["StandardTokenizer", "lowercase", "tokenize_lower"]

# --- character classes (UAX#29 word-break properties, common members) -------
_HAN = "⺀-⻿々〇㐀-䶿一-鿿豈-﫿"
_HIRA = "ぁ-ゖゝ-ゟ"
_KATA = "ァ-ヺー-ヿㇰ-ㇿｦ-ﾝ"
# kana voiced/semi-voiced sound marks (WB:Extend) — the common-member
# slice of WB4's Extend set for CJK text: U+3099/309A combining (NFD
# kana) and U+FF9E/FF9F halfwidth (ﾊﾟ). They attach to the preceding
# kana/Han token (KatakanaEx/HiraganaEx/HanEx = X [Format Extend]* in
# the reference JFlex grammar) so CJKWidthFilter can compose ｺ+ﾞ→ゴ
# within one token. General Latin combining marks (Mn) remain a
# documented deviation (web text is overwhelmingly NFC).
_KMARK = "\u3099\u309a\uff9e\uff9f"
_CJK = _HAN + _HIRA + _KATA + _KMARK

# letters+digits excluding underscore and the CJK ranges handled separately
_ALNUM = rf"[^\W_{_CJK}]"
_LETTER = rf"[^\W\d_{_CJK}]"

# MidLetter ∪ MidNumLet ∪ Single_Quote — joins letter.letter
_MIDLETTER = "['’.:··״‧]"
# MidNum ∪ MidNumLet ∪ Single_Quote — joins digit.digit
_MIDNUM = "['’.,;٫٬︐︓︔]"

_TOKEN_RE = (
    rf"(?:_+)?{_ALNUM}"
    rf"(?:{_ALNUM}|_|{_MIDLETTER}(?<={_LETTER}.)(?={_LETTER})|{_MIDNUM}(?<=\d.)(?=\d))*"
    rf"|[{_HAN}][{_KMARK}]*|[{_HIRA}][{_KMARK}]*|[{_KATA}][{_KATA}{_KMARK}]*"
)

# Codepoints where Python's str.lower() disagrees with Java's codepoint-wise
# Character.toLowerCase(int): U+0130 (İ) expands to 2 codepoints in Python.
_JAVA_LOWER_EXCEPTIONS = {"İ": "i"}
# Any codepoint whose lowercase is context-sensitive or multi-char in Python:
_SLOW_LOWER_RE = re.compile("[İΣ]")  # İ, Σ (final-sigma context rule)


def lowercase(s: str) -> str:
    """Codepoint-wise lowercase matching Java ``Character.toLowerCase(int)``.

    Fast path: plain ``str.lower`` (identical for all codepoints except the
    two context/expansion cases, which are checked first).
    """
    if _SLOW_LOWER_RE.search(s) is None:
        return s.lower()
    out = []
    for ch in s:
        repl = _JAVA_LOWER_EXCEPTIONS.get(ch)
        if repl is not None:
            out.append(repl)
        elif ch == "Σ":
            out.append("σ")  # always medial sigma, no context rule
        else:
            out.append(ch.lower())
    return "".join(out)


class StandardTokenizer:
    """Compile-once tokenizer; instantiate once per actor (``__init__`` state)."""

    def __init__(self, max_token_length: int = 255):
        self.max_token_length = max_token_length
        self._re = re.compile(_TOKEN_RE)

    def tokenize(self, text: str) -> List[str]:
        toks = self._re.findall(text)
        m = self.max_token_length
        if not toks:
            return toks
        # split over-long tokens into m-sized chunks (JFlex buffer behavior)
        out = []
        for t in toks:
            if len(t) <= m:
                out.append(t)
            else:
                out.extend(t[i : i + m] for i in range(0, len(t), m))
        return out

    def tokenize_lower(self, text: str) -> List[str]:
        return [lowercase(t) for t in self.tokenize(text)]


_DEFAULT = StandardTokenizer()


def tokenize_lower(text: str) -> List[str]:
    """Module-level convenience using the default (255) tokenizer."""
    return _DEFAULT.tokenize_lower(text)
