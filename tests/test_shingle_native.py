"""Differential lock: native (C/numpy mapInArrow) shingle path vs the
Catalyst expression path, plus the XXH64 kernel's bit-exactness vs
Spark's own ``xxhash64``.

The native path is an OPT-IN (``ARC_SHINGLE_IMPL=native`` — the r13
A/B in SCALING.md showed it slower end-to-end on this corpus, so expr
stays the default), but its correctness contract is locked here so the
escape hatch can never rot: identical arrays INCLUDING order, identical
NULL semantics (NULL text and <k-word docs), across a unicode-casing
corpus (Turkish dotted/dotless I, ligatures, full-width forms — the
byte sequences most likely to expose a UTF-8/byte-order bug in a hash
kernel) and word lengths that straddle every XXH64 tail branch
(<4 / <8 / <32 / 32 / >32 bytes).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from arc_spark.operators._cxxh import native_xxh64_batch, xxh64_bytes
from arc_spark.operators.dedup import _shingled

# casing/nasty corpus: exercises multi-byte UTF-8 through the byte
# hasher and (belt-and-braces) any future path that moves casing out
# of the JVM — İ lowercases to 2 codepoints, ﬁ stays a ligature,
# full-width forms map inside the BMP, ß/ẞ and final sigma are the
# classic special-casing traps
NASTY_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog the quick brown"),
    (1, None),
    (2, ""),
    (3, "one two"),
    (4, "İstanbul ıı Iı İİ dotted and dotless forms here"),
    (5, "ﬁligree ﬂow ﬀ ligatures ﬁ ﬂ mixed with ascii words"),
    (6, "ＡＢＣ　full　width　ｆｏｒｍｓ and ascii again"),
    (7, "ß ẞ STRASSE straße Σίσυφος ΤΕΛΟΣ τέλος words"),
    (8, "🎉 emoji 🎉 emoji 🎉 combining á́ marks á"),
    (9, "   leading and   trailing   spaces   collapse   here   "),
    (10, "x" * 40 + " " + "y" * 33 + " " + "z" * 32 + " " + "q" * 31
         + " " + "w" * 8 + " " + "v" * 7 + " " + "u" * 4 + " a bc def"),
    (11, "solo"),
    (12, "exactly three words"),
    (13, "a b c a b c a b c duplicate shingles collapse"),
    (14, "İ ı ǅ ǆ titlecase digraphs Ǆ"),
]


def _run_both(spark, df, k):
    prev = os.environ.get("ARC_SHINGLE_IMPL")
    try:
        os.environ["ARC_SHINGLE_IMPL"] = "expr"
        exp = {r["doc"]: r["shingles"]
               for r in _shingled(df, "doc_id", "text", k).collect()}
        os.environ["ARC_SHINGLE_IMPL"] = "native"
        got = {r["doc"]: r["shingles"]
               for r in _shingled(df, "doc_id", "text", k).collect()}
    finally:
        if prev is None:
            os.environ.pop("ARC_SHINGLE_IMPL", None)
        else:
            os.environ["ARC_SHINGLE_IMPL"] = prev
    return exp, got


@pytest.mark.parametrize("k", [1, 2, 3, 5])
def test_native_matches_expr_on_casing_corpus(spark, k):
    df = spark.createDataFrame(NASTY_DOCS, "doc_id long, text string")
    exp, got = _run_both(spark, df, k)
    assert exp == got  # arrays compare INCLUDING order


def test_native_matches_expr_random_unicode(spark):
    # deterministic pseudo-random unicode word soup: BMP letters from
    # several scripts + lengths hitting every XXH64 tail branch
    import random

    rnd = random.Random(1337)
    alphabets = [
        "abcdefghijklmnopqrstuvwxyz",
        "αβγδεζηθικλμνξοπρςστυφχψω",
        "абвгдежзийклмнопрстуфхцчш",
        "ıİiIßẞﬁﬂ",
        "一二三四五六七八九十",
        "ａｂｃｄｅｆ",
    ]
    docs = []
    for d in range(200):
        n_words = rnd.randint(0, 40)
        ws = []
        for _ in range(n_words):
            ab = rnd.choice(alphabets)
            ln = rnd.choice([1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 31, 32, 33, 40])
            ws.append("".join(rnd.choice(ab) for _ in range(ln)))
        docs.append((d, " ".join(ws) if ws else rnd.choice(["", None])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exp, got = _run_both(spark, df, 3)
    assert exp == got


def test_xxh64_bytes_matches_spark(spark):
    cases = ["", "a", "ab", "abc", "abcd", "İ", "ﬁ", "ß", "🎉",
             "x" * 31, "x" * 32, "x" * 33, "x" * 100,
             "İstanbul çğöşü ĲĳŉǄǅǆ"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    for c, g in zip(cases, got):
        e = xxh64_bytes(c.encode("utf-8"), 42)
        assert g == (e - (1 << 64) if e >= (1 << 63) else e), c


def test_c_kernel_matches_python_twin():
    fn = native_xxh64_batch()
    if fn is None:
        pytest.skip("no C compiler available")
    import numpy as np

    cases = [b"", b"a", "İstanbul".encode(), b"x" * 32, b"y" * 33,
             b"z" * 100, bytes(range(256))]
    data = b"".join(cases)
    offs = np.zeros(len(cases) + 1, np.int32)
    np.cumsum([len(c) for c in cases], out=offs[1:])
    out = np.empty(len(cases), np.uint64)
    fn(data, offs.ctypes.data, len(cases), 42, out.ctypes.data)
    for c, o in zip(cases, out):
        assert int(o) == xxh64_bytes(c, 42)


def test_minhash_numpy_empty_shingles_null_sig():
    # r12 advice: np.minimum.reduceat misbehaves on zero-length
    # segments (returns the NEXT doc's first slot / IndexError at the
    # tail) — an empty shingle array must yield a NULL signature like
    # NULL shingles do, on every position including the last
    import pandas as pd

    from arc_spark.operators.dedup import _minhash_numpy_gen

    gen = _minhash_numpy_gen(4, ())
    pdf = pd.DataFrame({
        "doc": [1, 2, 3, 4],
        "shingles": [[11, 22], [], [33], []],
    })
    out = pd.concat(list(gen([pdf])))
    sig = dict(zip(out["doc"], out["sig"]))
    sz = dict(zip(out["doc"], out["sz"]))
    assert sig[2] is None and sig[4] is None
    assert pd.isna(sz[2]) and pd.isna(sz[4])
    assert sig[1] is not None and len(sig[1]) == 4 and sz[1] == 2
    assert sig[3] is not None and sz[3] == 1
