"""Synthesize COMPOSED poked tiers — pairwise interactions of the
fourteen single-variable families.

Every convention so far was derived one poked family at a time
(ties, skew, extreme ids, unicode, monster docs, ...), so each sweep
holds every other variable organic. Interactions are the likeliest
remaining hiding place (round-7 verdict #3): a spelling can be
correct under ties AND under skew yet wrong when the ties happen
INSIDE the dominant group, or bounded for ASCII monsters but
quadratic in bytes for multi-byte ones. Three compositions, chosen
for the conventions they jointly exercise:

* ``extremeid_skew`` — the extreme-id remap (tools/extremeid_tier.py)
  then a hot-key rekey whose HOT ids live in the extreme bands: the
  80 %-owner user id is NEGATIVE (-6, the remap image of organic user
  5) and the 50 %-owner customer key is 2^62+1 (the image of custkey
  1). Jointly exercises the sentinel re-encode (user_id < 0 is real
  data, C14) with a dominant negative entity, the per-entity
  admission cap (C30) on a negative hot key, floor-mod bucketing
  (C10) where the modal bucket is the negative class, and id
  checksums/products (C12/C6) at 2^62 magnitude times half the corpus.

* ``ties_skew`` — the boundary/tie snap (tools/boundary_tier.py) then
  the hot-key rekey (tools/skew_tier.py), a pure chain: 80 % of
  events belong to ONE user AND sit on 6-hour/15-minute timestamp
  grids with exact-duplicate times inside that user. Jointly
  exercises every rank/session/as-of tiebreak (C27, C33's
  deterministic-tiebreak rule) inside a single dominant partition —
  tie-breaking where the tie set is the whole corpus, and the
  giant-group element order is carried by event_id alone.

* ``unicode_monster`` — the Unicode pokes (tools/unicode_tier.py)
  then monster-doc amplification where BOTH monsters are multi-byte:
  the repeat-monster's unit gets a mixed CJK/sharp-s/combining
  payload appended before the ~150x repeat, and the single-token
  blob is repeat('ß数', 30000) (~60k chars, 2-3 UTF-8 bytes each)
  instead of ASCII 'z's. Jointly exercises the ASCII fold contract
  (C20/C21) and every per-document array expression (C24's bound-
  array rule) at monster length in CHARACTERS while the byte length
  is ~2.5x larger — the pocket where a per-BYTE quadratic or a
  JVM-vs-utf8proc length disagreement hides from both parents.

All synthesis is DuckDB-deterministic, so both engines read
byte-identical parquet. Used by tests/test_composed_oracle.py (full
oracle parity sweeps).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb

from tools import boundary_tier, extremeid_tier, skew_tier, unicode_tier

SRC = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# hot ids in the EXTREME bands of the extremeid remap image
HOT_USER_NEG = -6                      # f(5) = -(5+1): negative band
HOT_CUST_HUGE = 4611686018427387905    # f(1) = 2^62 + 1: huge band
HOT_PART = 1                           # part ids are not remapped

# Rekey selectors run at SYNTHESIS time only (DuckDB), so they just
# need determinism; pmod spellings keep the hot fractions ~stable on
# the remapped (negative/huge) id values.
_EXTREME_SKEW_REWRITE = {
    "events": (
        "* REPLACE (CASE WHEN ((event_id % 5) + 5) % 5 != 0 "
        f"THEN CAST({HOT_USER_NEG} AS BIGINT) ELSE user_id END AS user_id)"
    ),
    "orders": (
        "* REPLACE (CASE WHEN ((o_orderkey % 2) + 2) % 2 = 0 "
        f"THEN CAST({HOT_CUST_HUGE} AS BIGINT) ELSE o_custkey END AS o_custkey)"
    ),
    "lineitem": (
        "* REPLACE (CASE WHEN ((l_orderkey % 10) + 10) % 10 < 3 "
        f"THEN CAST({HOT_PART} AS BIGINT) ELSE l_partkey END AS l_partkey)"
    ),
    "documents": (
        "* REPLACE (CASE WHEN ((doc_id % 5) + 5) % 5 != 2 "
        "THEN 'src0' ELSE source END AS source)"
    ),
}

# multi-byte monster payloads (unicode x monster composition)
_MB_UNIT = "straße café 数据处理 Σίσυφος"   # appended before the repeat
_MB_BLOB_ATOM = "ß数"                        # 2- and 3-byte UTF-8 chars
# 400 repeats (vs the parent's 150): at sf0.001 the repeat-monster's
# doc_id (3) is ALSO unicode class 3 (text set to ''), so the repeated
# unit is just the multi-byte payload — 400 repeats keep the composed
# monster at ~11k chars / ~18k bytes of pure multi-byte text
_MB_REPEATS = 400
_MB_BLOB_ATOMS = 30_000                      # ~60k chars, ~150k bytes


def _rewrite_tier(src: str, dst_root: str, rewrite: dict[str, str]) -> str:
    os.makedirs(dst_root, exist_ok=True)
    con = duckdb.connect()
    for name in TABLES:
        s = os.path.join(src, f"{name}.parquet")
        d = os.path.join(dst_root, f"{name}.parquet")
        if name in rewrite:
            con.execute(
                f"COPY (SELECT {rewrite[name]} FROM read_parquet('{s}')) "
                f"TO '{d}' (FORMAT PARQUET)"
            )
        elif os.path.isfile(s):
            shutil.copy2(s, d)
        else:
            shutil.copytree(s, d)
    con.close()
    return dst_root


def extremeid_skew(dst_root: str, src: str = SRC) -> str:
    """Extreme-id remap, then hot-key rekey into the extreme bands."""
    with tempfile.TemporaryDirectory(prefix="xid_") as tmp:
        mid = extremeid_tier.synthesize(os.path.join(tmp, "xid"), src=src)
        return _rewrite_tier(mid, dst_root, _EXTREME_SKEW_REWRITE)


def ties_skew(dst_root: str, src: str = SRC) -> str:
    """Boundary/tie snap, then the standard hot-key rekey (pure chain)."""
    with tempfile.TemporaryDirectory(prefix="ties_") as tmp:
        mid = boundary_tier.synthesize(os.path.join(tmp, "ties"), src=src)
        return skew_tier.synthesize(dst_root, src=mid)


def unicode_monster(dst_root: str, src: str = SRC) -> str:
    """Unicode pokes, then MULTI-BYTE monster documents."""
    rewrite = {
        "documents": f"""
            * REPLACE (
              CASE
                WHEN doc_id % 499 = 3
                  THEN trim(repeat(text || ' {_MB_UNIT} ', {_MB_REPEATS}), ' ')
                WHEN doc_id % 499 = 7
                  THEN repeat('{_MB_BLOB_ATOM}', {_MB_BLOB_ATOMS})
                ELSE text
              END AS text)
        """,
    }
    with tempfile.TemporaryDirectory(prefix="unimon_") as tmp:
        mid = unicode_tier.synthesize(os.path.join(tmp, "uni"), src=src)
        return _rewrite_tier(mid, dst_root, rewrite)


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "extremeid_skew"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/composed_{which}"
    print({"extremeid_skew": extremeid_skew,
           "ties_skew": ties_skew,
           "unicode_monster": unicode_monster}[which](out))
