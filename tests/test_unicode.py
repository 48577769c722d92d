"""Unicode byte-exactness: spans must serialize content as-is — no NFC/NFKC
drift, no silent normalization (SURVEY.md §7 "what's hard": the reference
corpus is Japanese; equality is byte-exact)."""

from __future__ import annotations

import unicodedata

import pandas as pd

from autoextract import corpus
from autoextract.operators.layout import assemble_spans, order_words

# NFD vs NFC forms of the same visible string — must NOT be conflated
NFC = unicodedata.normalize("NFC", "ガ行の濁点")  # precomposed
NFD = unicodedata.normalize("NFD", "ガ行の濁点")  # combining marks
FULLWIDTH = "ＡＢＣ１２３"  # fullwidth forms (NFKC would fold these)
EMOJI_ZWJ = "👩‍🔬"  # ZWJ sequence


def _words_df(spark, texts):
    rows = []
    for i, t in enumerate(texts):
        rows.append(
            {
                "doc_id": "uni-1",
                "page": 1,
                "word_seq": i,
                "kind": "text",
                "content": t,
                "media_ref": None,
                "rec_score": 1.0,
                "points": [[50.0, 100.0 + 60 * i], [250.0, 100.0 + 60 * i],
                           [250.0, 130.0 + 60 * i], [50.0, 130.0 + 60 * i]],
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=corpus.OCR_WORDS_SCHEMA)


def test_spans_preserve_exact_codepoints(spark, tmp_path):
    texts = [NFC, NFD, FULLWIDTH, EMOJI_ZWJ]
    assert NFC != NFD  # sanity: the fixture really differs at codepoint level
    spans_df = assemble_spans(order_words(_words_df(spark, texts)))
    # round-trip through parquet (the real storage boundary)
    out = str(tmp_path / "spans")
    spans_df.write.parquet(out)
    back = spark.read.parquet(out).collect()[0]["spans"]
    got = [s["text"] for s in back]
    assert got == texts  # byte-exact, order-exact
    assert got[0] != got[1]  # NFC and NFD stayed distinct


def test_extraction_values_not_normalized(spark):
    from autoextract.operators.extract import extract_fields
    from autoextract.schema import AppSchema

    label_nfd = unicodedata.normalize("NFD", "ガス料金")
    schema = AppSchema(
        name="u", fields=[{"name": "gas", "display_name": label_nfd, "type": "string"}]
    )
    value = unicodedata.normalize("NFD", "１２３ガ")
    df = _words_df(spark, [f"{label_nfd}：{value}"])
    rows = extract_fields(order_words(df), schema).collect()
    assert rows[0]["value"] == value  # exact codepoints, no folding
    # an NFC-normalized schema label must NOT match NFD words
    schema2 = AppSchema(
        name="u2",
        fields=[{"name": "gas", "display_name": unicodedata.normalize("NFC", label_nfd), "type": "string"}],
    )
    rows2 = extract_fields(order_words(df), schema2).collect()
    assert rows2[0]["value"] == ""


# ---------------------------------------------------------- mojibake


def test_fix_mojibake_single_and_double():
    from autoextract.functions.encoding import fix_mojibake_str

    clean = "café déjà-vu — naïve"
    once = clean.encode("utf-8").decode("latin-1")
    twice = once.encode("utf-8").decode("latin-1")
    assert fix_mojibake_str(once) == (clean, True)
    assert fix_mojibake_str(twice) == (clean, True)


def test_fix_mojibake_cp1252_punctuation():
    from autoextract.functions.encoding import fix_mojibake_str

    clean = "it’s “fine — really"  # no ”: 0x9D is a cp1252 hole, so a
    # strict cp1252 corrupter can never have produced it
    bad = clean.encode("utf-8").decode("cp1252")
    assert fix_mojibake_str(bad) == (clean, True)
    # a SLOPPY-cp1252 corrupter (holes fall back to C1 controls) does
    # produce it; the latin-1 fallback in the repair handles that shape
    sloppy = "”".encode("utf-8").decode("latin-1")
    assert fix_mojibake_str(sloppy) == ("”", True)


def test_fix_mojibake_leaves_clean_text_alone():
    from autoextract.functions.encoding import fix_mojibake_str

    for s in ["plain ascii", "清酒 un vrai café", "ωβγ", ""]:
        assert fix_mojibake_str(s) == (s, False)


def test_repair_mojibake_dataframe(spark):
    from autoextract.functions.encoding import repair_mojibake

    clean = "résumé with café"
    bad = clean.encode("utf-8").decode("latin-1")
    df = spark.createDataFrame(
        [(1, bad, "x"), (2, "ascii only", "y"), (3, "tokyo 東京", "z")],
        "doc_id long, text string, extra string",
    )
    rows = {r.doc_id: (r.text, r.repaired, r.extra)
            for r in repair_mojibake(df).collect()}
    assert rows[1] == (clean, True, "x")
    assert rows[2] == ("ascii only", False, "y")
    assert rows[3] == ("tokyo 東京", False, "z")


# ----------------------------------------------------------------------
# NFC normalization
# ----------------------------------------------------------------------

def test_nfc_recomposes_and_flags(spark):
    from autoextract.functions.encoding import normalize_unicode

    df = spark.createDataFrame(
        [(1, "caf" + "e\u0301"),     # decomposed -> recomposes
         (2, "caf\u00e9"),           # already NFC -> untouched, flag false
         (3, "plain ascii"),            # ascii early-exit
         (4, None)],                    # null passthrough
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["text"], r["normalized"])
           for r in normalize_unicode(df).collect()}
    assert got[1] == ("caf\u00e9", True)
    assert got[2] == ("caf\u00e9", False)
    assert got[3] == ("plain ascii", False)
    assert got[4] == (None, False)


def test_nfkc_compatibility_fold(spark):
    from autoextract.functions.encoding import normalize_unicode

    df = spark.createDataFrame(
        [(1, "\ufb01le \uff21")],   # fi ligature + full-width A
        "doc_id long, text string",
    )
    nfc = normalize_unicode(df).collect()[0]["text"]
    nfkc = normalize_unicode(df, form="NFKC").collect()[0]["text"]
    assert nfc == "\ufb01le \uff21" # canonical form conflates neither
    assert nfkc == "file A"             # compatibility form folds both


def test_detect_decode_rules():
    from autoextract.functions.encoding import detect_decode_bytes as dd

    assert dd(b"hello") == ("ascii", False, True, "hello")
    assert dd("naïve".encode("utf-8")) == ("utf-8", False, True, "naïve")
    assert dd(b"\xef\xbb\xbfhi") == ("utf-8", True, True, "hi")
    assert dd(b"\xff\xfe" + "ab".encode("utf-16-le")) == (
        "utf-16le", True, True, "ab")
    assert dd(b"\xfe\xff" + "ab".encode("utf-16-be")) == (
        "utf-16be", True, True, "ab")
    # the FF FE 00 00 trap: UTF-32LE, not UTF-16LE + NULs
    assert dd(b"\xff\xfe\x00\x00" + "z".encode("utf-32-le")) == (
        "utf-32le", True, True, "z")
    assert dd("café".encode("cp1252")) == ("cp1252", False, True, "café")
    # cp1252-undefined byte 0x81 → latin-1 total fallback
    assert dd(b"a\x81b")[0] == "latin-1"
    # torn UTF-16: odd byte count after BOM → valid=false, no re-guess
    enc, bom, valid, text = dd(b"\xff\xfe" + b"a\x00b")
    assert (enc, bom, valid, text) == ("utf-16le", True, False, None)
    assert dd(b"") == ("empty", False, True, "")
    assert dd(None) == ("empty", False, False, None)


def test_detect_and_decode_kernel(spark):
    from autoextract.functions.encoding import detect_and_decode

    rows = [
        (1, b"\xef\xbb\xbfplain"),
        (2, "gemütlich".encode("cp1252")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in detect_and_decode(df).collect()}
    assert out[1]["encoding"] == "utf-8" and out[1]["had_bom"]
    assert out[2]["encoding"] == "cp1252" and out[2]["text"] == "gemütlich"
    assert out[3]["encoding"] == "empty" and not out[3]["valid"]
