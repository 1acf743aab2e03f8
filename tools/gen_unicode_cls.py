"""Generate the packed UAX#29 codepoint-class bitmaps used by the
vectorized Unicode tokenizer path (analysis/fast_tokenizer.py).

The semantic reference is the regex StandardTokenizer
(analysis/tokenizer.py); each class bitmap is derived by matching every
codepoint against the SAME character-class patterns the regex is built
from, so the vectorized path cannot drift from the reference — any regex
change regenerates the tables.

Run from the repo root:

    python tools/gen_unicode_cls.py

writes lucene_solr_ray/analysis/data/uax29_cls.npz (~80 KB compressed;
eight packed 0x110000-bit maps).
"""
from __future__ import annotations

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_ray.analysis.tokenizer import (  # noqa: E402
    _HAN,
    _HIRA,
    _KATA,
    _LETTER,
    _MIDLETTER,
    _MIDNUM,
)

N = 0x110000

# (name, single-codepoint regex) — exactly the classes the token regex uses
CLASSES = {
    "digit": r"\d",
    "letter": _LETTER,
    "midl": _MIDLETTER,
    "midn": _MIDNUM,
    "han": f"[{_HAN}]",
    "hira": f"[{_HIRA}]",
    "kata": f"[{_KATA}]",
}


def build() -> dict:
    out = {}
    cps = "".join(map(chr, range(N)))
    for name, pat in CLASSES.items():
        rx = re.compile(pat)
        mask = np.zeros(N, dtype=bool)
        # findall over the full-codepoint string: every class is a
        # single-codepoint pattern, so match positions ARE codepoints
        for m in rx.finditer(cps):
            mask[m.start()] = True
        out[name] = np.packbits(mask)
    return out


def main() -> None:
    data_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "lucene_solr_ray", "analysis", "data",
    )
    os.makedirs(data_dir, exist_ok=True)
    maps = build()
    # sanity: ASCII projection must agree with the byte table the ASCII
    # fast path uses
    digit = np.unpackbits(maps["digit"])[:128]
    letter = np.unpackbits(maps["letter"])[:128]
    assert digit[ord("0") : ord("9") + 1].all() and digit.sum() == 10
    for c in "azAZ":
        assert letter[ord(c)]
    assert not letter[ord("0")] and not letter[ord("_")]
    midl = np.unpackbits(maps["midl"])[:128]
    assert midl[ord("'")] and midl[ord(".")] and midl[ord(":")]
    midn = np.unpackbits(maps["midn"])[:128]
    assert midn[ord("'")] and midn[ord(".")] and midn[ord(",")] and midn[ord(";")]
    path = os.path.join(data_dir, "uax29_cls.npz")
    np.savez_compressed(path, **maps)
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
