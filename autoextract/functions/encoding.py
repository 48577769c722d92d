"""Mojibake detection + repair — the ftfy-style encoding-fix stage every
web-scale text pipeline runs between charset decode and quality filtering.

The dominant wild failure: UTF-8 bytes decoded as Latin-1/Windows-1252
somewhere upstream ("é" → "Ã©", "ä" → "Ã¤", "—" → "â€”"). The inverse is
mechanical — re-encode the text through the 8-bit codec it was wrongly
decoded with and decode the bytes as UTF-8 — and is applied only when that
round-trip strictly succeeds, so clean text (including clean non-ASCII
text, whose Latin-1 bytes are NOT valid UTF-8) is provably untouched.
Double-encoded payloads unwind over ``max_rounds`` iterations.

Encoding choice: try Windows-1252 first (the codec real pipelines decode
with — its 0x80–0x9F block holds the punctuation that appears in mojibake
like "â€™"), fall back to Latin-1 (covers the C1 range cp1252 leaves
undefined). Pure CPython string codecs inside an Arrow-batched
``mapInPandas`` stage — per-row byte re-coding is inherent to the task
(same stance as the PDF/codec kernels); the stage is narrow, zero
shuffles, and O6-contained (a pathological row passes through unrepaired,
never fails the task).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def fix_mojibake_str(s: str, max_rounds: int = 2) -> tuple[str, bool]:
    """One string → (repaired string, whether anything changed)."""
    if s is None:
        return s, False
    fixed, repaired = s, False
    for _ in range(max_rounds):
        if fixed.isascii():
            break
        data = None
        for codec in ("cp1252", "latin-1"):
            try:
                data = fixed.encode(codec)
                break
            except UnicodeEncodeError:
                continue
        if data is None:
            break
        try:
            cand = data.decode("utf-8")
        except UnicodeDecodeError:
            break
        if cand == fixed:
            break
        fixed, repaired = cand, True
    return fixed, repaired


def repair_mojibake(
    docs: DataFrame, text_col: str = "text", max_rounds: int = 2
) -> DataFrame:
    """Replace ``text_col`` with its mojibake-repaired form and append a
    ``repaired`` boolean. All other columns pass through unchanged."""
    cols = docs.columns
    out_fields = ", ".join(
        f"`{c}` {docs.schema[c].dataType.simpleString()}" for c in cols
    )
    schema = f"{out_fields}, repaired boolean"

    def kernel(batches):
        for pdf in batches:
            fixed, flags = [], []
            for s in pdf[text_col]:
                f, r = fix_mojibake_str(s, max_rounds=max_rounds)
                fixed.append(f)
                flags.append(r)
            pdf = pdf.copy()
            pdf[text_col] = fixed
            pdf["repaired"] = pd.Series(flags, index=pdf.index, dtype=bool)
            yield pdf

    return docs.mapInPandas(kernel, schema=schema)


def normalize_unicode(
    docs: DataFrame, text_col: str = "text", form: str = "NFC"
) -> DataFrame:
    """Replace ``text_col`` with its Unicode-normalized form (NFC by
    default — the canonical composition every dedup/hash stage should see:
    ``é`` as U+00E9 and as ``e``+U+0301 are the SAME text and must hash the
    same) and append ``normalized`` (whether the string changed).

    Arrow-batched ``mapInPandas`` over ``unicodedata.normalize`` with a
    per-string ``isascii`` early-exit (ASCII is normalization-invariant in
    every form, and a real corpus is mostly ASCII).  NFKC is available for
    the aggressive compatibility fold (ligatures, full-width forms) that
    some tokenizer pipelines want; the default stays canonical-only so
    visually distinct characters are never conflated silently.

    Driver-gated against DuckDB's independent ICU implementation
    (``nfc_normalize``) — a genuine cross-engine equivalence, not a replay.
    """
    import unicodedata

    cols = docs.columns
    out_fields = ", ".join(
        f"`{c}` {docs.schema[c].dataType.simpleString()}" for c in cols
    )
    schema = f"{out_fields}, normalized boolean"

    def kernel(batches):
        for pdf in batches:
            fixed, flags = [], []
            for s in pdf[text_col]:
                if s is None or s.isascii():
                    fixed.append(s)
                    flags.append(False)
                    continue
                n = unicodedata.normalize(form, s)
                fixed.append(n)
                flags.append(n != s)
            pdf = pdf.copy()
            pdf[text_col] = fixed
            pdf["normalized"] = pd.Series(flags, index=pdf.index, dtype=bool)
            yield pdf

    return docs.mapInPandas(kernel, schema=schema)
