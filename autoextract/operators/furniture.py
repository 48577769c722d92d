"""Page-furniture removal + hyphenation repair — the two classic
PDF-text post-extraction cleanups.

Real document corpora carry *page furniture*: running headers, running
footers, and page numbers repeated on (nearly) every page of a document.
The reference pipeline inherits whatever its OCR emits — furniture lines
land inside the extracted text (``ocr-containers/ocr/app/ocr.py`` returns
every detected word; nothing strips repeats) — and every serious
extraction pipeline (Grobid, Marker, pdfplumber recipes) removes them
before the text is used as training data.  These operators bolt onto the
engine's ordered-words shape (``layout.order_words`` output: ``doc_id,
page, seq, content, x0..y1, block_id, line_id, word_id``).

Scale shape (pure JVM, no UDFs):

- ``lines_table``: ONE partial-agg shuffle keyed on
  ``(doc_id, page, line_id)`` — map-side combine collapses each line's
  handful of words before the exchange.
- ``mark_furniture``: candidate lines (top/bottom band only) aggregate on
  ``(doc_id, xxhash64(norm_text), band)`` — the 8-byte hash keeps the
  shuffle key short; raw line text never becomes a join key.  Per-doc page
  counts ride a second short-key aggregate and join back broadcast-side
  when small.  Page-frequency thresholds mark a line furniture only when
  the SAME normalized text recurs in the SAME band on enough pages.
- ``repair_hyphenation``: a single window pass over the partitioning the
  lines aggregate already established (lag/lead within
  ``(doc_id, page)``) — no extra exchange at the default partitioning.

Normalization folds digit runs to ``#`` so ``Page 3 of 12`` matches
``Page 7 of 12``, the canonical page-number pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "lines_table",
    "mark_furniture",
    "strip_furniture",
    "repair_hyphenation",
    "detect_headings",
    "document_outline",
]


def lines_table(ordered: DataFrame) -> DataFrame:
    """Collapse reading-ordered words into one row per text line.

    Input: ``layout.order_words`` output (or anything with ``doc_id, page,
    block_id, line_id, seq, kind, content, y0, y1``).  ``line_id`` is
    per-BLOCK in the layout kernel (``page_reading_order``), so the line
    key is ``(doc_id, page, block_id, line_id)``.  Media rows (``kind !=
    'text'``) are excluded — a figure placeholder is never furniture.

    Output: ``doc_id, page, block_id, line_id, y0, y1, text`` with
    ``text`` the words of the line joined in reading order.  One
    partial-agg shuffle.
    """
    words = ordered.where(F.col("kind") == "text")
    return words.groupBy("doc_id", "page", "block_id", "line_id").agg(
        F.min("seq").alias("seq0"),
        F.min("y0").alias("y0"),
        F.max("y1").alias("y1"),
        # sort_array over (seq, content) structs = order within the line
        # without a window; map-side partial aggregation still applies
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("seq"), F.col("content")))
                ),
                lambda s: s["content"],
            ),
            " ",
        ).alias("text"),
    )


def _norm_line(col):
    """Furniture-matching normalization: lowercase, digit runs → ``#``,
    whitespace collapsed.  ``Page 3 of 12`` ≡ ``page # of #``."""
    out = F.lower(F.trim(col))
    out = F.regexp_replace(out, "[0-9]+", "#")
    return F.regexp_replace(out, r"\s+", " ")


def mark_furniture(
    lines: DataFrame,
    page_height: float,
    *,
    band_frac: float = 0.2,
    min_pages: int = 2,
    min_page_frac: float = 0.5,
) -> DataFrame:
    """Flag repeated header/footer lines.

    A line is furniture iff BOTH:

    1. it sits in the top or bottom ``band_frac`` of the page
       (``y1 <= band_frac*H`` → ``header`` band; ``y0 >= (1-band_frac)*H``
       → ``footer`` band; body lines are never candidates, however often
       they repeat), and
    2. its normalized text recurs in the SAME band on ``>= min_pages``
       distinct pages AND on ``>= min_page_frac`` of the document's pages
       (so a one-off date stamp in the header band survives).

    Adds ``band`` (``header``/``footer``/``body``) and ``is_furniture``.
    Single-page documents never produce furniture (``min_pages >= 2``).
    """
    h = float(page_height)
    band = (
        F.when(F.col("y1") <= h * band_frac, F.lit("header"))
        .when(F.col("y0") >= h * (1.0 - band_frac), F.lit("footer"))
        .otherwise(F.lit("body"))
    )
    lines = lines.withColumn("band", band).withColumn(
        "norm_h", F.xxhash64(_norm_line(F.col("text")))
    )

    n_pages = lines.groupBy("doc_id").agg(
        F.countDistinct("page").alias("n_pages")
    )
    # candidate repetition census: band lines only, short 8-byte key
    reps = (
        lines.where(F.col("band") != "body")
        .groupBy("doc_id", "band", "norm_h")
        .agg(F.countDistinct("page").alias("rep_pages"))
    )
    out = (
        lines.join(F.broadcast(n_pages), "doc_id")
        .join(reps, ["doc_id", "band", "norm_h"], "left")
        .withColumn(
            "is_furniture",
            (F.col("band") != "body")
            & (F.coalesce(F.col("rep_pages"), F.lit(0)) >= min_pages)
            & (
                F.coalesce(F.col("rep_pages"), F.lit(0))
                >= F.ceil(F.col("n_pages") * min_page_frac)
            ),
        )
        .drop("norm_h", "rep_pages", "n_pages")
    )
    return out


def strip_furniture(
    lines: DataFrame, page_height: float, **kwargs
) -> DataFrame:
    """``mark_furniture`` then keep body text: the lines a training
    pipeline feeds forward."""
    marked = mark_furniture(lines, page_height, **kwargs)
    return marked.where(~F.col("is_furniture")).drop("is_furniture")


def repair_hyphenation(lines: DataFrame) -> DataFrame:
    """Re-join words split by end-of-line hyphenation (``exam-`` / ``ple``
    → ``example``), the other classic OCR/PDF extraction artifact.

    Rule (the standard conservative heuristic): a line ending in
    ``<letter>{2}-`` merges with the next line of the SAME (doc_id, page)
    when that line starts with a lowercase letter.  A plain fragment
    merges seamlessly (``exam-`` + ``ple`` → ``example``); a fragment that
    already contains an interior hyphen is a compound broken at its own
    hyphen, so the hyphen is KEPT (``state-of-the-`` + ``art`` →
    ``state-of-the-art``).  A hyphen before a capitalized word
    (``docu-`` + ``Ment``), before punctuation, or after digits
    (``19xx-``) is left verbatim.

    Implementation: one window over ``(doc_id, page) ORDER BY seq0`` (the
    line's reading-order position from ``lines_table``) —
    ``lead`` donates the next line's first word to the merge, ``lag``
    tells a line whether its first word was consumed by the previous line.
    Pure JVM expressions; zero extra shuffles when the input is already
    partitioned by doc (the lines aggregate's layout).

    Output: input columns with ``text`` rewritten (``text_raw`` preserves
    the original).
    """
    w = Window.partitionBy("doc_id", "page").orderBy("seq0")
    # trailing fragment: last word of the line when it ends letter{2,}-
    frag = F.regexp_extract(F.col("text"), r"(\S*\p{L}{2})-$", 0)
    next_text = F.lead("text").over(w)
    next_first = F.regexp_extract(next_text, r"^(\S+)", 1)
    merge_ok = (frag != "") & next_first.rlike(r"^\p{Ll}")

    prev_text = F.lag("text").over(w)
    prev_frag = F.regexp_extract(prev_text, r"(\S*\p{L}{2})-$", 0)
    first = F.regexp_extract(F.col("text"), r"^(\S+)", 1)
    consumed = (prev_frag != "") & first.rlike(r"^\p{Ll}")

    # this line's text: drop the consumed first word, then append the
    # merged word when our own tail hyphen fires
    base = F.when(
        consumed, F.ltrim(F.regexp_replace(F.col("text"), r"^\S+\s*", ""))
    ).otherwise(F.col("text"))
    # the merged word: fragment + next line's first word; the trailing
    # hyphen survives only for compounds (interior hyphen in the fragment)
    stem = F.regexp_replace(frag, r"-$", "")
    merged_word = F.concat(
        F.when(stem.contains("-"), frag).otherwise(stem), next_first
    )
    repaired = F.when(
        merge_ok,
        F.concat(
            F.regexp_replace(base, r"\S+-$", ""),  # drop trailing fragment
            merged_word,
        ),
    ).otherwise(base)
    return (
        lines.withColumn("text_raw", F.col("text"))
        .withColumn("__merge_ok", merge_ok)
        .withColumn("__consumed", consumed)
        .withColumn("text", repaired)
        .drop("__merge_ok", "__consumed")
    )


def detect_headings(
    lines: DataFrame, *, h1_factor: float = 1.7, h2_factor: float = 1.3
) -> DataFrame:
    """Classify heading lines by relative text height — the standard
    PDF-outline heuristic (no font table survives OCR; box height is the
    font-size proxy).

    A line whose height is ≥ ``h1_factor`` × the DOCUMENT's median line
    height is a level-1 heading, ≥ ``h2_factor`` × a level-2; everything
    else gets ``level`` NULL.  Medians are per-document (one exact
    ``percentile`` aggregate on the short doc_id key) and broadcast back —
    a scanned book and a dense form each normalize to their own body size.
    """
    med = lines.groupBy("doc_id").agg(
        F.expr("percentile(y1 - y0, 0.5)").alias("__med_h")
    )
    joined = lines.join(F.broadcast(med), "doc_id")
    ratio = (F.col("y1") - F.col("y0")) / F.col("__med_h")
    level = (
        F.when(ratio >= h1_factor, F.lit(1))
        .when(ratio >= h2_factor, F.lit(2))
        .otherwise(F.lit(None).cast("int"))
    )
    return joined.withColumn("level", level).drop("__med_h")


def document_outline(lines: DataFrame, **kwargs) -> DataFrame:
    """The document's heading tree in reading order: ``(doc_id, page,
    seq0, level, text)`` for heading lines only — the table-of-contents a
    training pipeline attaches as structure metadata."""
    return (
        detect_headings(lines, **kwargs)
        .where(F.col("level").isNotNull())
        .select("doc_id", "page", "seq0", "level", "text")
    )
