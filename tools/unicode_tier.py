"""Synthesize a Unicode/empty-string-poked copy of a testdata tier.

Identical rows to the source tier except deterministic classes of
``documents.text`` and ``customer.c_name`` are replaced or extended
with adversarial-but-legal UTF-8 payloads: empty strings,
whitespace-only strings, NBSP/ideographic-space word separators,
NFC vs NFD accent spellings, one-to-many special-casing characters
(German sharp-s, Turkish dotted capital I, the apostrophe-n ligature),
Greek final-sigma context casing, unspaced CJK, RTL Hebrew with
directional marks, ZWJ emoji families and astral-plane mathematical
alphanumerics, a zalgo combining-mark stack, and compatibility
ligatures/fractions.

Why: the organic corpus is pure ASCII, so every string function the
engine leans on (length/lower/upper/split/regexp/substring) is only
exercised where JVM and utf8proc semantics coincide.  Real 100 TB web
corpora are none of those things.  Both engines read byte-identical
parquet, so any oracle divergence on this tier is a genuine
string-semantics difference between Spark's JVM (full SpecialCasing:
upper(sharp-s) = 'SS', context-sensitive final sigma) and DuckDB's
utf8proc (simple one-to-one case mapping) — or an unguarded
empty-string/zero-token division in a tokenization or quality query.

Invisible separators are spelled with explicit escapes and the NFD
class is derived via ``unicodedata.normalize`` so the intended
codepoints survive any editor/tooling transcoding (asserted in the
sweep's synthesis fixture).

Used by tests/test_unicode_text.py, which re-runs the full DuckDB
oracle comparison on the poked tier.
"""

from __future__ import annotations

import os
import shutil

import duckdb

SRC = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_NBSP = " "
_IDEO = "　"  # ideographic space
_ZWJ = "‍"
_RLM = "‏"

# doc_id % 97 -> payload transform. 'set' replaces the text outright;
# 'append' adds the payload after a plain ASCII space so the organic
# prefix (and every ASCII-only convention) keeps a foothold in the row.
DOC_POKES: dict[int, tuple[str, str]] = {
    # empty string (not NULL) and whitespace-only -> zero tokens
    3: ("set", ""),
    7: ("set", "   "),
    # NBSP inside what a space-splitter sees as one "word"
    11: ("set", f"data{_NBSP}engine{_NBSP}spark row"),
    # NFC precomposed accents: café résumé naïve
    13: ("append", "café résumé naïve"),
    # the same words NFD-decomposed: café ...
    17: ("append", "café résumé naïve"),
    # German sharp-s: upper() is one-to-many 'SS' under SpecialCasing
    19: ("append", "straße MAß GROSS"),
    # Turkish dotted capital I (U+0130) / dotless i (U+0131)
    23: ("append", "İstanbul ılık I i"),
    # unspaced CJK
    29: ("append", "数据处理引擎的规模"),
    # Hebrew + right-to-left mark
    31: ("append", f"שלום עליכם{_RLM}"),
    # ZWJ emoji family, rocket, astral mathematical fraktur letters
    37: ("append", f"\U0001f469{_ZWJ}\U0001f469{_ZWJ}\U0001f467 \U0001f680 "
                   "\U0001d518\U0001d52b\U0001d526"),
    # zalgo combining stack on 'z'
    41: ("append", "ź̂̃̄̅̆̇algo"),
    # control whitespace mix
    43: ("set", "\t\n mixed\twhitespace\nlines \r\n"),
    # vulgar fractions, roman numeral, fi/fl ligatures, apostrophe-n
    47: ("append", "⅛ ½ Ⅻ ﬁﬂ ŉ"),
    # Greek with final sigma (U+03c2) and an all-caps sigma word
    53: ("append", "Σίσυφος "
                   "ΟΔΥΣΣΕΥΣ"),
    # ideographic-space separators
    59: ("append", f"{_IDEO}wide{_IDEO}space{_IDEO}"),
}

# class 17 is the SAME words as class 13, NFD-decomposed: visually
# identical, byte-different — distinct tokens to any exact matcher
import unicodedata as _ud  # noqa: E402

DOC_POKES[17] = ("append", _ud.normalize("NFD", DOC_POKES[13][1]))
assert DOC_POKES[17][1] != DOC_POKES[13][1]

# c_custkey % 53 -> replacement name
CUST_POKES: dict[int, str] = {
    5: "Customer Ünïcode#000000005",
    9: "",
    21: "straßeİΣ customer",
}


def synthesize(dst_root: str, src: str = SRC) -> str:
    """Write the poked tier under ``dst_root``; returns the tier dir."""
    os.makedirs(dst_root, exist_ok=True)
    con = duckdb.connect()
    for name in TABLES:
        s = os.path.join(src, f"{name}.parquet")
        d = os.path.join(dst_root, f"{name}.parquet")
        if name == "documents":
            df = con.execute(f"SELECT * FROM read_parquet('{s}')").df()

            def poke_text(row):
                mode_payload = DOC_POKES.get(int(row["doc_id"]) % 97)
                if mode_payload is None or row["text"] is None:
                    return row["text"]
                mode, payload = mode_payload
                return payload if mode == "set" else f"{row['text']} {payload}"

            df["text"] = df.apply(poke_text, axis=1)
            con.register("poked_docs", df)
            con.execute(f"COPY poked_docs TO '{d}' (FORMAT PARQUET)")
            con.unregister("poked_docs")
        elif name == "customer":
            df = con.execute(f"SELECT * FROM read_parquet('{s}')").df()

            def poke_name(row):
                rep = CUST_POKES.get(int(row["c_custkey"]) % 53)
                if rep is None or row["c_name"] is None:
                    return row["c_name"]
                return rep

            df["c_name"] = df.apply(poke_name, axis=1)
            con.register("poked_cust", df)
            con.execute(f"COPY poked_cust TO '{d}' (FORMAT PARQUET)")
            con.unregister("poked_cust")
        elif os.path.isfile(s):
            shutil.copy2(s, d)
        else:
            shutil.copytree(s, d)
    con.close()
    return dst_root


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/unicode_tier"
    print(synthesize(out))
