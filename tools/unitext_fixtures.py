"""Write a UNICODE-TEXT copy of a fixture directory — the sixth
data-shape adversary (shuffle → order, skew → hot keys, nullify →
missing values, extremes → magnitudes, ties → equal timestamps,
unitext → ASCII-only luck).

Every byte of the clean `documents.text` is printable ASCII, so
every tokenizer regex, case-fold, length computation, shingle
window, and entropy kernel in the engine has been accidentally
ASCII-only — and the two engines' regex/Unicode stacks (Spark =
Java regex + UTF8String, DuckDB = RE2 + utf8proc) have never been
forced to agree off the ASCII plane. Real corpora are not ASCII:
the interesting divergences live exactly at

- **case folding** — Turkish İ (U+0130) lowercases to `i̇` (i +
  combining dot, TWO code points) under Java but utf8proc may fold
  differently; German ß uppercases to SS on some stacks.
- **code points vs UTF-16 units** — 🤖 (U+1F916) is one code point
  but two Java chars; any path that counts String.length()-style
  units instead of code points shows here.
- **canonical equivalence** — café in NFC (4 cp) vs NFD (5 cp,
  e + combining acute): same rendering, different lengths and
  different shingles; nothing may silently normalize on one engine.
- **tokenizer classes** — Java `\\w`/`\\s` are ASCII-by-default,
  RE2's are ASCII-always; CJK runs without spaces, zero-width
  space (U+200B) inside words, NBSP (U+00A0) instead of space, and
  CRLF/tab whitespace decide whether the two tokenizers still
  produce identical token streams.

Mutations (seeded, documents.text only): ~10% of docs get a
unicode token pack appended (drawn from the pools above), ~2% get
one inner space swapped to NBSP, ~2% to a CRLF, ~1% get a
zero-width space spliced inside an existing word. `n_chars` is
recomputed as CODE POINTS (the generator invariant n_chars ==
len(text) is preserved — Python len == Spark length == DuckDB
length, all code-point counts). lang/source/doc_id stay untouched:
mutating labels changes the question, not the robustness of the
tokenizers.

    python tools/unitext_fixtures.py --src /root/testdata/sf0.001 \
        --dst /tmp/sf0.001_unitext
    python tools/check_oracle.py --sf /tmp/sf0.001_unitext

`tests/test_unitext_invariance.py` runs the text-prone subset of
the surface against a unicode copy on every suite run.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# Unicode token packs. Each entry is appended verbatim (space-joined)
# to a victim document. Comments give the attack each pack carries.
PACKS = (
    # NFC accents (each accented letter = 1 code point)
    "caf\u00e9 na\u00efve r\u00e9sum\u00e9",
    # NFD: same words, e + COMBINING ACUTE (U+0301) = 2 code points
    "cafe\u0301 re\u0301sume\u0301",
    # CJK run, no spaces (whitespace tokenizers see one token)
    "\u65e5\u672c\u8a9e\u30c6\u30ad\u30b9\u30c8\u51e6\u7406",
    # Cyrillic
    "\u0434\u0430\u043d\u043d\u044b\u0435 \u043f\u043e\u0442\u043e\u043a",
    # non-BMP emoji (UTF-16 surrogate pairs; 1 code point each)
    "\U0001f916\U0001f680 \U0001f9e0",
    # Turkish dotted capital I (U+0130) + German sharp s case traps
    "\u0130stanbul STRASSE stra\u00dfe",
    # fullwidth ABC + fi ligature (U+FB01)
    "\uff21\uff22\uff23 \ufb01le",
    # RTL Arabic + Hebrew
    "\u0645\u0631\u062d\u0628\u0627 \u05e9\u05dc\u05d5\u05dd",
    # genuine mojibake: UTF-8 bytes re-decoded as Latin-1 ("\u00c3\u00a9"
    # = e-acute double-decoded, "\u00e2\u20ac\u2122" = curly apostrophe
    # double-decoded) + U+FFFD — q248's census patterns meet DATA-borne
    # damage, not just its own in-query plant
    "\u00c3\u00a9t\u00c3\u00a9 \u00e2\u20ac\u2122 \ufffd",
)
NBSP = "\u00a0"  # no-break space: not ASCII \s on either engine
ZWSP = "\u200b"  # zero-width space: invisible word splitter


def unitextify_dir(
    src: str,
    dst: str,
    seed: int = 2033,
    frac_pack: float = 0.10,
    frac_nbsp: float = 0.02,
    frac_crlf: float = 0.02,
    frac_zwsp: float = 0.01,
) -> dict[str, object]:
    """Mutate `src` into `dst`; returns counts per mutation class and
    the resulting non-ASCII doc count."""
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    info: dict[str, object] = {}
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        tab = pq.read_table(p)
        n = tab.num_rows
        if t == "documents":
            texts = tab["text"].to_pylist()
            n_pack = n_nbsp = n_crlf = n_zwsp = 0

            pk_mask = rng.random(n) < frac_pack
            picks = rng.integers(0, len(PACKS), size=n)
            for i in range(n):
                if pk_mask[i] and texts[i] is not None:
                    texts[i] = texts[i] + " " + PACKS[picks[i]]
                    n_pack += 1

            for frac, repl, bump in (
                (frac_nbsp, NBSP, "nbsp"),
                (frac_crlf, "\r\n", "crlf"),
            ):
                mask = rng.random(n) < frac
                for i in range(n):
                    if not (mask[i] and texts[i]):
                        continue
                    sp = [k for k, ch in enumerate(texts[i]) if ch == " "]
                    if not sp:
                        continue
                    k = sp[int(rng.integers(0, len(sp)))]
                    texts[i] = texts[i][:k] + repl + texts[i][k + 1 :]
                    if bump == "nbsp":
                        n_nbsp += 1
                    else:
                        n_crlf += 1

            z_mask = rng.random(n) < frac_zwsp
            for i in range(n):
                if z_mask[i] and texts[i] and len(texts[i]) > 4:
                    k = int(rng.integers(2, len(texts[i]) - 2))
                    texts[i] = texts[i][:k] + ZWSP + texts[i][k:]
                    n_zwsp += 1

            info.update(
                n_pack=n_pack,
                n_nbsp=n_nbsp,
                n_crlf=n_crlf,
                n_zwsp=n_zwsp,
                n_nonascii=sum(
                    1 for x in texts if x and any(ord(c) > 127 for c in x)
                ),
            )
            ti = tab.schema.get_field_index("text")
            tab = tab.set_column(
                ti, tab.schema.field("text"), pa.array(texts, pa.string())
            )
            # preserve the generator invariant n_chars == len(text)
            # (code points on all three of Python/Spark/DuckDB)
            ci = tab.schema.get_field_index("n_chars")
            tab = tab.set_column(
                ci,
                tab.schema.field("n_chars"),
                pa.array(
                    [None if x is None else len(x) for x in texts],
                    tab.schema.field("n_chars").type,
                ),
            )
        pq.write_table(
            tab,
            os.path.join(dst, f"{t}.parquet"),
            row_group_size=max(1, n // 3 + 1),
        )
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/sf0.001_unitext")
    ap.add_argument("--seed", type=int, default=2033)
    args = ap.parse_args()
    info = unitextify_dir(args.src, args.dst, args.seed)
    print(f"unitextified {args.src} into {args.dst}: {info}")


if __name__ == "__main__":
    main()
