"""PDF text-layer branch (sources/pdf.py): writer↔parser round-trip, the
reference's 10-page cap (pdf.py:122-124), error containment, and raw PDF
bytes → spans end-to-end through dispatch + layout."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from autoextract.operators.layout import spans_table
from autoextract.sources import ingest
from autoextract.sources.pdf import (
    MAX_PAGES,
    make_text_pdf,
    pdf_meta,
    pdf_page_count,
    pdf_word_rows,
    pdf_words_table,
    render_docs_to_pdf,
)


def test_roundtrip_single_page():
    pdf = make_text_pdf([[("hello", 50, 60), ("world", 140, 60)]])
    rows = pdf_word_rows("d1", pdf)
    assert [(r["page"], r["word_seq"], r["content"]) for r in rows] == [
        (1, 0, "hello"),
        (1, 1, "world"),
    ]
    # boxes carry the typeset geometry back exactly
    assert rows[0]["points"][0] == [50.0, 60.0]
    assert rows[1]["points"][0] == [140.0, 60.0]


def test_roundtrip_escapes_and_unicode():
    tricky = ["par(en)s", "back\\slash", "注文日：2023年"]
    pdf = make_text_pdf([[(t, 50 + 120 * i, 60) for i, t in enumerate(tricky)]])
    assert [r["content"] for r in pdf_word_rows("d", pdf)] == tricky


def test_multipage_order_and_cap():
    pdf = make_text_pdf([[(f"p{i}", 50, 60)] for i in range(MAX_PAGES)])
    rows = pdf_word_rows("d", pdf)
    assert [r["page"] for r in rows] == list(range(1, MAX_PAGES + 1))
    over = make_text_pdf([[(f"p{i}", 50, 60)] for i in range(MAX_PAGES + 1)])
    with pytest.raises(ValueError, match="too many pages"):
        pdf_word_rows("d", over)


def test_stream_payload_mimicking_object_syntax():
    """Raw stream bytes that happen to contain '<n> 0 obj' / 'endobj' runs
    (an embedded JPEG can) must not corrupt the object split: _objects walks
    sequentially and jumps stream payloads via /Length instead of regex-
    scanning the whole file."""
    from autoextract.sources.pdf import pdf_media_payloads

    evil = (
        b"\xff\xd8 fake jpeg body\n99 0 obj\n<< /Type /Pages /Kids [1 0 R] >>\n"
        b"endobj\nstream\nendstream\nmore bytes\xff\xd9"
    )
    pdf = make_text_pdf(
        [[("hello", 50, 60), (None, 50, 200, 100, 80)]], image_jpeg=evil
    )
    # text still parses and the payload comes back byte-identical — the fake
    # 'endobj' inside the stream neither truncates the image object nor
    # plants a bogus object 99 (whose /Type /Pages would hijack page lookup)
    assert [r["content"] for r in pdf_word_rows("d", pdf) if r["kind"] == "text"] == ["hello"]
    assert pdf_media_payloads(pdf) == [evil]


def test_malformed_pdf_zero_pages():
    assert pdf_page_count(b"%PDF-1.4 truncated junk") == 0
    assert pdf_page_count(b"") == 0


def test_pdf_meta_flags_cap_and_garbage(spark):
    import pandas as pd

    over = make_text_pdf([[("w", 50, 60)] for _ in range(MAX_PAGES + 2)])
    ok = make_text_pdf([[("w", 50, 60)]])
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["ok", "over", "junk"],
                "payload": [ok, over, b"%PDF- nope"],
            }
        ),
        schema="doc_id string, payload binary",
    )
    meta = {r["doc_id"]: r for r in pdf_meta(df).collect()}
    assert meta["ok"]["valid"] and meta["ok"]["n_pages"] == 1
    assert not meta["over"]["valid"] and "too many pages" in meta["over"]["error"]
    assert not meta["junk"]["valid"] and meta["junk"]["n_pages"] == 0
    # the over-cap doc contributes ZERO word rows (containment, not a crash)
    words = pdf_words_table(df)
    assert words.where(F.col("doc_id") == "over").count() == 0
    assert words.where(F.col("doc_id") == "ok").count() == 1


def test_raw_pdf_bytes_to_spans_end_to_end(spark):
    """gen_raw_docs → sniff → dispatch['pdfs'] → word boxes → spans."""
    raw = ingest.gen_raw_docs(spark, 40, seed=5)
    pdfs = ingest.dispatch(ingest.sniff(raw))["pdfs"]
    n_pdfs = pdfs.count()
    assert n_pdfs > 0
    spans = spans_table(pdf_words_table(pdfs))
    got = spans.collect()
    assert len(got) == n_pdfs
    for row in got:
        texts = [s["text"] for s in row["spans"]]
        assert texts[1:] == ["pdf", "body", "words"]  # typeset content back
        assert [s["offset"] for s in row["spans"]] == list(range(len(texts)))


def test_render_docs_multipage_roundtrip(spark):
    """60 tokens at 6/line × 5 lines/page → a 2-page PDF that reassembles to
    the source text (the pdf_ingest_spans oracle's invariant)."""
    import pandas as pd

    text = " ".join(f"tok{i}" for i in range(60))
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["m1"], "text": [text]}),
        schema="doc_id string, text string",
    )
    raw = render_docs_to_pdf(docs)
    payload = bytes(raw.collect()[0]["payload"])
    assert pdf_page_count(payload) == 2
    spans = spans_table(pdf_words_table(raw)).collect()[0]
    assert " ".join(s["text"] for s in spans["spans"]) == text


def test_interleaved_media_roundtrip(spark):
    """The north_rule payload is INTERLEAVED text + media: a PDF with image
    placements between text lines parses to media word boxes and assembles
    into spans with media_ref placeholders at the right offsets."""
    pdf = make_text_pdf(
        [
            [
                ("intro", 50, 60),
                ("text", 150, 60),
                (None, 50, 120, 400, 150),  # figure between the lines
                ("after", 50, 320),
                ("figure", 150, 320),
            ]
        ]
    )
    rows = pdf_word_rows("m1", pdf)
    kinds = [r["kind"] for r in rows]
    assert kinds == ["text", "text", "media", "text", "text"]
    med = rows[2]
    assert med["media_ref"] == "pdf:m1:0" and med["content"] is None
    assert med["points"][0] == [50.0, 120.0] and med["points"][2] == [450.0, 270.0]

    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["m1"], "payload": [pdf]}),
        schema="doc_id string, payload binary",
    )
    spans = spans_table(pdf_words_table(df)).collect()[0]["spans"]
    assert [s["kind"] for s in spans] == ["text", "text", "media", "text", "text"]
    assert spans[2]["media_ref"] == "pdf:m1:0" and spans[2]["text"] is None
    assert [s["offset"] for s in spans] == [0, 1, 2, 3, 4]


# ----------------------------------------------------------------------
# r3: real-world text-layer subset — FlateDecode, Tm, TD/TL/T*/', TJ,
# /Contents arrays
# ----------------------------------------------------------------------

from autoextract.sources import pdf as P


def _sig(rows):
    return [(r["page"], r["word_seq"], r["kind"], r["content"], r["points"])
            for r in rows]


def test_flate_and_tm_roundtrip_identical():
    """Compressed streams and absolute Tm positioning must parse back to
    exactly the same word boxes as the plain Td/uncompressed shape."""
    pages = [
        [("hello", 50, 60), ("world", 140, 60), (None, 50, 120, 80, 40)],
        [("page2", 50, 60)],
    ]
    base = _sig(P.pdf_word_rows("d", P.make_text_pdf(pages)))
    for compress in (False, True):
        for use_tm in (False, True):
            b = P.make_text_pdf(pages, compress=compress, use_tm=use_tm)
            assert _sig(P.pdf_word_rows("d", b)) == base, (compress, use_tm)
    assert len(base) == 4


def test_lzw_and_objstm_roundtrip_identical():
    """The two highest-frequency wild-PDF features beyond r3's subset:
    /LZWDecode content streams and PDF 1.5 object streams (dict objects
    packed compressed inside a /Type /ObjStm, classic xref replaced by a
    binary xref STREAM). Both must parse back identical word boxes."""
    pages = [
        [("hello", 50, 60), ("world", 140, 60), (None, 50, 120, 80, 40)],
        [("page2", 50, 60)],
    ]
    base = _sig(P.pdf_word_rows("d", P.make_text_pdf(pages)))
    lzw = P.make_text_pdf(pages, compress="lzw")
    assert b"/LZWDecode" in lzw
    assert _sig(P.pdf_word_rows("d", lzw)) == base
    # PDF 1.5 shape: repackage each writer variant through an object stream
    for compress in (False, True, "lzw"):
        modern = P.to_objstm_pdf(P.make_text_pdf(pages, compress=compress))
        assert modern.startswith(b"%PDF-1.5")
        assert b"/ObjStm" in modern and b"/XRef" in modern
        assert b"trailer" not in modern  # classic table fully replaced
        assert _sig(P.pdf_word_rows("d", modern)) == base, compress
    # embedded media also survives the 1.5 repackaging
    jpeg = b"\xff\xd8payload\xff\xd9"
    modern_media = P.to_objstm_pdf(
        P.make_text_pdf([[("x", 50, 60), (None, 50, 200, 90, 70)]], image_jpeg=jpeg)
    )
    assert P.pdf_media_payloads(modern_media) == [jpeg]


def test_ascii85_flate_chain_roundtrip():
    """Cascaded /Filter [/ASCII85Decode /FlateDecode] — the armored form
    older real-world writers emit — parses back identically."""
    pages = [[("hello", 50, 60), ("world", 140, 60)]]
    base = _sig(P.pdf_word_rows("d", P.make_text_pdf(pages)))
    b = P.make_text_pdf(pages, compress="a85+flate")
    assert b"/ASCII85Decode" in b and b"/FlateDecode" in b
    assert _sig(P.pdf_word_rows("d", b)) == base


def test_type0_identity_h_tounicode_roundtrip():
    """Composite Type0 / Identity-H fonts: text is typeset as 2-byte CID
    hex-string shows and recovered through the real /ToUnicode CMap — the
    wild-PDF shape CJK and subset-embedded-font documents use. Unicode
    (incl. CJK) must survive, and geometry must match the simple-font
    typesetting exactly."""
    pages = [
        [("hello", 50, 60), ("注文日：2023年", 140, 60)],
        [("page2", 50, 60)],
    ]
    base = _sig(P.pdf_word_rows("d", P.make_text_pdf(pages)))
    t0 = P.make_text_pdf(pages, font="type0")
    assert b"/Identity-H" in t0 and b"/ToUnicode" in t0
    assert b"(hello)" not in t0  # no literal strings: all shows are CID hex
    assert _sig(P.pdf_word_rows("d", t0)) == base
    # compressed + Tm + 1.5-objstm repackaged variant too
    modern = P.to_objstm_pdf(
        P.make_text_pdf(pages, font="type0", compress=True, use_tm=True)
    )
    assert _sig(P.pdf_word_rows("d", modern)) == base


def test_runlength_filter_roundtrip():
    """/RunLengthDecode (PackBits-style) — codec round-trip on adversarial
    byte patterns plus a full writer→parser pass."""
    import numpy as np

    rng = np.random.RandomState(3)
    for case in (b"", b"a", b"aaaa", b"abc" * 50, b"\x00" * 300,
                 bytes(rng.randint(0, 256, 1000, dtype=np.uint8).data)):
        assert P.rle_decode_pdf(P.rle_encode_pdf(case)) == case
    pages = [[("hello", 50, 60), ("world", 140, 60)]]
    base = _sig(P.pdf_word_rows("d", P.make_text_pdf(pages)))
    b = P.make_text_pdf(pages, compress="rle")
    assert b"/RunLengthDecode" in b
    assert _sig(P.pdf_word_rows("d", b)) == base


def test_png_predictor_flate_stream():
    """FlateDecode + /DecodeParms /Predictor 12 (PNG Up) — how real writers
    wrap ObjStm/xref streams. The unfilter must reverse Sub/Up/Average/
    Paeth row filtering exactly."""
    import zlib as _z

    import numpy as np

    content = b"BT /F1 12 Tf 50 720 Td (pred) Tj ET"
    cols = 10
    rows_n = -(-len(content) // cols)
    padded = content + b" " * (rows_n * cols - len(content))
    # pre-filter with Up (tag 2): row[i] - prevrow[i]
    filtered = bytearray()
    prev = bytes(cols)
    for r in range(rows_n):
        row = padded[r * cols : (r + 1) * cols]
        filtered += bytes([2]) + bytes((row[k] - prev[k]) & 0xFF for k in range(cols))
        prev = row
    comp = _z.compress(bytes(filtered))
    body = (
        b"<< /Length %d /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 12 /Columns %d >> >>\nstream\n%s\nendstream"
        % (len(comp), cols, comp)
    )
    assert P._stream_of(body).rstrip() == content
    # direct unfilter parity against a NumPy reference for all four filters
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (6, 8), dtype=np.uint8)
    for tag in (0, 1, 2, 3, 4):
        filt = bytearray()
        prev = np.zeros(8, dtype=np.int32)
        for r in range(6):
            row = img[r].astype(np.int32)
            if tag == 0:
                enc = row
            elif tag == 1:
                enc = row - np.concatenate(([0], row[:-1]))
            elif tag == 2:
                enc = row - prev
            elif tag == 3:
                left = np.concatenate(([0], row[:-1]))
                enc = row - ((left + prev) >> 1)
            else:
                a = np.concatenate(([0], row[:-1]))
                c = np.concatenate(([0], prev[:-1]))
                p = a + prev - c
                pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c))
                enc = row - pred
            filt += bytes([tag]) + bytes((enc & 0xFF).astype(np.uint8))
            prev = row
        got = P._png_unpredict(bytes(filt), columns=8)
        assert got == img.tobytes(), f"filter {tag}"


def test_inline_images_roundtrip_and_containment():
    """BI..ID..EI inline images (PDF 8.9.7): placements parse with the same
    geometry as the XObject form, payloads come back byte-identical, and —
    the key robustness claim — binary payloads containing text-operator
    byte runs fabricate NO words (the extractor splits them out before the
    op regex runs)."""
    raw = bytes(range(48))  # 4x4 RGB
    pages = [[("hello", 50, 60), (None, 50, 120, 80, 40), ("world", 140, 60)]]
    base = _sig(P.pdf_word_rows("d", P.make_text_pdf(pages)))
    for compress in (False, True, "lzw"):
        b = P.make_text_pdf(pages, compress=compress, inline_image=(4, 4, raw))
        assert b"BI /W 4" in b or compress  # plain form carries BI verbatim
        assert _sig(P.pdf_word_rows("d", b)) == base, compress
        assert P.pdf_media_payloads(b) == [raw]
    # encrypted inline images decrypt then split
    enc = P.encrypt_pdf(P.make_text_pdf(pages, inline_image=(4, 4, raw)))
    assert _sig(P.pdf_word_rows("d", enc)) == base
    assert P.pdf_media_payloads(enc) == [raw]
    # adversarial payload: looks like text operators; must add zero words
    evil = b"BT /F1 12 Tf 50 700 Td (FAKE) Tj ET 99 0 obj endobj "
    evil += bytes(48 - len(evil) % 48 if len(evil) % 48 else 0)
    b = P.make_text_pdf(pages, inline_image=(4, len(evil) // 12, evil))
    words = [r["content"] for r in P.pdf_word_rows("d", b) if r["kind"] == "text"]
    assert words == ["hello", "world"]
    assert P.pdf_media_payloads(b) == [evil]


def test_tiff_predictor_2():
    import zlib as _z

    content = b"BT /F1 12 Tf 50 720 Td (tiffpred) Tj ET"
    cols = 8
    rows_n = -(-len(content) // cols)
    padded = bytearray(content + b" " * (rows_n * cols - len(content)))
    diff = bytearray(padded)
    for r0 in range(0, len(diff), cols):  # horizontal differencing
        for k in range(cols - 1, 0, -1):
            diff[r0 + k] = (diff[r0 + k] - diff[r0 + k - 1]) & 0xFF
    comp = _z.compress(bytes(diff))
    body = (
        b"<< /Length %d /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 2 /Columns %d >> >>\nstream\n%s\nendstream"
        % (len(comp), cols, comp)
    )
    assert P._stream_of(body).rstrip() == content


def test_encrypted_pdf_roundtrip():
    """Standard-security-handler RC4 (V1/R2, empty user password — the
    common 'protected but openable' wild shape): streams are ciphertext on
    disk, the parser verifies the empty password against /U and decrypts
    per-object, and every writer variant parses back identically."""
    pages = [
        [("hello", 50, 60), ("world", 140, 60), (None, 50, 120, 80, 40)],
        [("page2", 50, 60)],
    ]
    base = _sig(P.pdf_word_rows("d", P.make_text_pdf(pages)))
    for compress in (False, True, "lzw"):
        enc = P.encrypt_pdf(P.make_text_pdf(pages, compress=compress))
        assert b"/Encrypt" in enc
        assert _sig(P.pdf_word_rows("d", enc)) == base, compress
    plain_enc = P.encrypt_pdf(P.make_text_pdf(pages))
    assert b"(hello)" not in plain_enc  # stream bodies really are ciphertext
    # V2/R3 128-bit RC4 (the common wild revision): same round-trip
    enc3 = P.encrypt_pdf(P.make_text_pdf(pages, compress=True), revision=3)
    assert b"/V 2 /R 3 /Length 128" in enc3
    assert _sig(P.pdf_word_rows("d", enc3)) == base
    # R3 with a wrong /U (≈ real user password): honestly unreadable
    locked3 = re.sub(rb"/U <[0-9a-f]+>", b"/U <" + b"11" * 32 + b">", enc3)
    assert P.pdf_word_rows("d", locked3) == []
    # embedded media decrypts byte-identically through pdf_media_table's path
    jpeg = b"\xff\xd8payload\xff\xd9"
    enc = P.encrypt_pdf(
        P.make_text_pdf([[("x", 50, 60), (None, 50, 200, 90, 70)]], image_jpeg=jpeg)
    )
    assert jpeg not in enc
    assert P.pdf_media_payloads(enc) == [jpeg]


def test_encrypted_unsupported_or_locked_contained():
    """Unsupported revisions and real-password files are honestly unreadable
    (zero words, pdf_meta error row) — never garbage text, never a crash."""
    enc = P.encrypt_pdf(P.make_text_pdf([[("hi", 50, 60)]]))
    assert P.pdf_word_rows("d", enc.replace(b"/R 2", b"/R 3")) == []
    locked = re.sub(rb"/U <[0-9a-f]+>", b"/U <" + b"00" * 32 + b">", enc)
    assert P.pdf_word_rows("d", locked) == []


def test_parse_tounicode_bfchar_and_bfrange():
    cmap = (
        b"begincmap 1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0001> <0041> <0002> <00480049> endbfchar\n"
        b"1 beginbfrange <0010> <0012> <0061> endbfrange endcmap"
    )
    m = P._parse_tounicode(cmap)
    assert m[1] == "A"
    assert m[2] == "HI"  # multi-unit bfchar target
    assert (m[0x10], m[0x11], m[0x12]) == ("a", "b", "c")


def test_corrupt_lzw_stream_contained():
    b = P.make_text_pdf([[("hi", 50, 60)]], compress="lzw")
    i = b.find(b"stream\n") + 7
    corrupted = b[: i + 2] + b"\xff\xff\xff\xff" + b[i + 6 :]
    assert P.pdf_word_rows("d", corrupted) == []


def test_corrupt_flate_stream_contained():
    b = P.make_text_pdf([[("hi", 50, 60)]], compress=True)
    # truncate the deflate body mid-stream: parse yields zero words, no raise
    i = b.find(b"stream\n") + 7
    corrupted = b[: i + 4] + b"\x00\x00" + b[i + 6 :]
    assert P.pdf_word_rows("d", corrupted) == []


def test_text_positioning_operators():
    """TD (move + set leading), TL, T*, ' (next-line show), TJ arrays with
    word-gap kerning — the real-world operator set beyond the writer's."""
    stream = (
        b"BT /F1 10 Tf 14 TL 1 0 0 1 50 700 Tm (alpha) Tj "
        b"0 -20 TD (beta) Tj T* (gamma) Tj (delta)' "
        b"[(ep)-50(si)-200(lon)] TJ ET"
    )
    els = P._replay_text_ops(stream, 792.0)
    assert [e[1] for e in els] == ["alpha", "beta", "gamma", "delta", "epsi lon"]
    # alpha at 792-700-10; each subsequent line 20 lower (TD leading, T*, ')
    assert [e[3] for e in els][:4] == [82.0, 102.0, 122.0, 142.0]


def test_tm_scale_multiplies_font_size():
    els = P._replay_text_ops(
        b"BT /F1 10 Tf 2 0 0 2 50 700 Tm (big) Tj ET", 792.0
    )
    assert els == [("text", "big", 50.0, 792.0 - 700.0 - 20.0, 20.0)]


def test_contents_array_concatenates_streams():
    """A page whose /Contents is an array of two stream refs reads both, in
    order (PDF 32000 §7.8.2)."""
    s1 = b"BT /F1 12 Tf 50 700 Td (first) Tj ET"
    s2 = b"BT /F1 12 Tf 50 650 Td (second) Tj ET"
    objs = (
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents [4 0 R 5 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
    ) % (len(s1), s1, len(s2), s2)
    pdf = b"%PDF-1.4\n" + objs + b"%%EOF"
    rows = P.pdf_word_rows("d", pdf)
    assert [r["content"] for r in rows] == ["first", "second"]


def test_render_docs_defaults_are_realworld_shape(spark):
    """render_docs_to_pdf emits FlateDecode + Tm by default (the shape the
    driver-checked pdf_ingest_spans round-trip therefore exercises)."""
    docs = spark.createDataFrame([("d0", "alpha beta gamma")], ["doc_id", "text"])
    payload = bytes(P.render_docs_to_pdf(docs).first()["payload"])
    assert b"/Filter /FlateDecode" in payload
    assert b" Td" not in payload  # positioning is via Tm inside the deflate
    rows = P.pdf_word_rows("d0", payload)
    assert [r["content"] for r in rows] == ["alpha", "beta", "gamma"]


def test_hex_string_show():
    """<hex> Tj shows byte-level text (simple-font PDFs); odd length pads."""
    els = P._replay_text_ops(
        b"BT /F1 12 Tf 50 700 Td <48656C6C6F> Tj 0 -20 TD <776F726C64> Tj ET",
        792.0,
    )
    assert [e[1] for e in els] == ["Hello", "world"]
    # odd-length pads a trailing zero nibble: 0x4 0x10 -> 'A\x00'... just parse
    assert P._hex_text(b"41") == "A" and P._hex_text(b"4") == "@"
    assert P._hex_text(b"zz") == ""


def test_embedded_media_rehydration_end_to_end(spark):
    """The full interleaved-document loop: PDFs carrying a REAL embedded
    JPEG (DCTDecode XObject) → spans with media_ref placeholders AND a media
    table with the actual bytes → join rehydrates placements → the
    multimodal kernels decode real pixels."""
    import numpy as np
    import pandas as pd

    from autoextract.operators import jpeg_codec as J
    from autoextract.operators.multimodal import embed_media

    img = (np.add.outer(np.linspace(0, 255, 24), np.linspace(0, 255, 32)) / 2).astype(np.uint8)
    jpeg = J.encode_jpeg(np.stack([img, img[::-1], np.full_like(img, 80)], axis=2))
    pages = [[("intro", 50, 60), (None, 50, 120, 320, 240), ("after", 50, 400)]]
    df = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": ["m1", "m2"],
            "payload": [P.make_text_pdf(pages, compress=True, image_jpeg=jpeg)] * 2,
        }),
        schema="doc_id string, payload binary",
    )
    media = P.pdf_media_table(df)
    rows = media.collect()
    assert len(rows) == 2
    assert {r["fmt"] for r in rows} == {"jpeg"}
    assert all(bytes(r["payload"]) == jpeg for r in rows)

    spans = spans_table(pdf_words_table(df))
    placements = spans.select(
        "doc_id", F.explode("spans").alias("s")
    ).where(F.col("s.kind") == "media").select("doc_id", F.col("s.media_ref").alias("media_ref"))
    joined = placements.join(media, ["doc_id", "media_ref"])
    assert joined.count() == 2  # every placeholder rehydrates

    vecs = embed_media(media).collect()
    assert len(vecs) == 2 and len(vecs[0]["embedding"]) == 16
    # identical payloads → identical pooled features
    assert list(vecs[0]["embedding"]) == list(vecs[1]["embedding"])


def test_encrypted_pdf_aes128_roundtrip():
    """V4/R4 with the AESV2 crypt filter (AES-128-CBC, empty user password
    — the modern default for 'protected' wild PDFs; the reference opens
    these via PyMuPDF, lambda/api/app/utils/pdf.py:53-87): streams carry
    IV+CBC ciphertext with /Length re-patched, string objects are
    encrypted too (7.6.2), and every writer variant parses back
    identically."""
    pages = [
        [("hello", 50, 60), ("world", 140, 60), (None, 50, 120, 80, 40)],
        [("page2", 50, 60)],
    ]
    base = _sig(P.pdf_word_rows("d", P.make_text_pdf(pages)))
    for compress in (False, True, "lzw"):
        enc = P.encrypt_pdf(P.make_text_pdf(pages, compress=compress), revision=4)
        assert b"/AESV2" in enc and b"(hello)" not in enc
        assert _sig(P.pdf_word_rows("d", enc)) == base, compress
    # Type0 + ObjStm modern shape under AES
    t0 = P.make_text_pdf(pages, font="type0", compress=True)
    t0base = _sig(P.pdf_word_rows("d", t0))
    enc_t0 = P.encrypt_pdf(t0, revision=4)
    assert b"(Adobe)" not in enc_t0  # string objects really are encrypted
    assert _sig(P.pdf_word_rows("d", enc_t0)) == t0base
    modern = P.to_objstm_pdf(P.make_text_pdf(pages, compress=True))
    assert _sig(P.pdf_word_rows("d", P.encrypt_pdf(modern, revision=4))) == _sig(
        P.pdf_word_rows("d", modern)
    )
    # embedded media decrypts byte-identically
    jpeg = b"\xff\xd8payload\xff\xd9"
    enc = P.encrypt_pdf(
        P.make_text_pdf([[("x", 50, 60), (None, 50, 200, 90, 70)]], image_jpeg=jpeg),
        revision=4,
    )
    assert jpeg not in enc
    assert P.pdf_media_payloads(enc) == [jpeg]


def test_encrypted_pdf_aes256_roundtrip():
    """V5 AES-256 (AESV3): R5 (plain SHA-256, deprecated Adobe rev) and R6
    (PDF 2.0 hardened Algorithm 2.B) — file key unwrapped from /UE after
    the empty-user-password check against U[:32]; a corrupted validation
    hash (≈ real password) is honestly unreadable."""
    pages = [[("hello", 50, 60), ("world", 140, 60)], [("page2", 50, 60)]]
    base = _sig(P.pdf_word_rows("d", P.make_text_pdf(pages)))
    for rev in (5, 6):
        enc = P.encrypt_pdf(P.make_text_pdf(pages), revision=rev)
        assert b"/AESV3" in enc and b"/UE <" in enc and b"(hello)" not in enc
        assert _sig(P.pdf_word_rows("d", enc)) == base, rev
    enc6 = P.encrypt_pdf(P.make_text_pdf(pages), revision=6)
    locked = re.sub(rb"/U <[0-9a-f]{8}", b"/U <00000000", enc6, count=1)
    assert P.pdf_word_rows("d", locked) == []


def test_encrypted_string_objects_rc4_conformant():
    """ADVICE r4: the standard handler encrypts string objects, not just
    streams (7.6.2) — RC4 fixtures now do too, so /Registry (Adobe) etc.
    are ciphertext on disk and round-trip through the parser."""
    pages = [[("café", 50, 60), ("naïve", 140, 60)]]
    t0 = P.make_text_pdf(pages, font="type0", compress=True)
    base = _sig(P.pdf_word_rows("d", t0))
    for rev in (2, 3):
        enc = P.encrypt_pdf(t0, revision=rev)
        assert b"(Adobe)" not in enc and b"(Identity)" not in enc, rev
        assert _sig(P.pdf_word_rows("d", enc)) == base, rev


def test_encrypted_pdf_v4_wild_variants():
    """Two V4 wild shapes beyond plain AESV2: /CFM /V2 (RC4-128 routed
    through the crypt-filter machinery — writers that 'upgraded' to V4
    without AES) and /EncryptMetadata false (Algorithm 2 step f: FFFFFFFF
    appended to the key-derivation MD5)."""
    pages = [[("hello", 50, 60), ("world", 140, 60)], [("page2", 50, 60)]]
    base = _sig(P.pdf_word_rows("d", P.make_text_pdf(pages, compress=True)))
    enc = P.encrypt_pdf(P.make_text_pdf(pages, compress=True), revision=4,
                        cfm_v2=True)
    assert b"/CFM /V2" in enc and b"(hello)" not in enc
    assert _sig(P.pdf_word_rows("d", enc)) == base
    enc = P.encrypt_pdf(P.make_text_pdf(pages, compress=True), revision=4,
                        encrypt_metadata=False)
    assert b"/EncryptMetadata false" in enc and b"/AESV2" in enc
    assert _sig(P.pdf_word_rows("d", enc)) == base
    # wrong step-f handling would fail the /U check → honestly unreadable,
    # so a parse that returns the words proves the key derivation variant


def test_raw_bitmap_xobject_wrapped_as_png():
    """The scanned-page/screenshot wild shape: a Flate-compressed 8-bit
    raw-bitmap image XObject (no image codec) extracts as a DECODABLE
    standalone PNG — downstream multimodal kernels get a file, not naked
    pixels. DCT payloads still pass through as the original JPEG bytes."""
    import numpy as np

    from autoextract.operators.png_codec import decode_png

    rng = np.random.RandomState(6)
    pages = [[("x", 50, 60), (None, 50, 200, 90, 70)]]
    pix = rng.randint(0, 256, (12, 9, 3)).astype(np.uint8)
    b = P.make_text_pdf(pages, compress=True, image_raw=(9, 12, pix.tobytes()))
    dec = decode_png(P.pdf_media_payloads(b)[0])
    assert np.array_equal(dec[:, :, :3], pix)
    g = rng.randint(0, 256, (7, 11)).astype(np.uint8)
    enc = P.encrypt_pdf(
        P.make_text_pdf(pages, image_raw=(11, 7, g.tobytes())), revision=4
    )
    dec = decode_png(P.pdf_media_payloads(enc)[0])
    assert np.array_equal(dec[:, :, 0], g)
    # the fmt column sees it as png through the media table path too
    from autoextract.operators.multimodal import sniff_format

    assert sniff_format(P.pdf_media_payloads(b)[0]) == "png"
