"""Stage 1: clean + language gate + sentence segmentation.

The reference consumes pre-segmented sentences from an upstream table and
never segments itself (SURVEY.md T3; spaCy parser disabled at
src/language_model/spacy_loader.py:140-142). Our input is whole pages
(BASELINE.json input_hint), so segmentation is ours: a deterministic
regex splitter.

Scale notes:
- Clean + split + posexplode are pure Catalyst expressions — whole-stage
  codegen, no Python, filters push to the parquet/Iceberg scan.
- The lang filter runs BEFORE segmentation (cheap gate before fan-out),
  mirroring the reference's cheap->expensive stage ordering
  (src/relation_extraction/infer.py:250-251).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_clean import clean_text_col

# Split AFTER sentence-final punctuation followed by whitespace. Java regex
# (JVM-side split); lookbehind keeps the terminator attached to the sentence.
SENTENCE_SPLIT_REGEX = "(?<=[.!?])\\s+"


def html_to_text_col(html_col: Column | str) -> Column:
    """Fallback html -> text extraction, fully JVM-side: strip script/style
    blocks, drop tags, unescape the common entities, collapse whitespace.

    The corpus normally arrives with `text` pre-extracted (BASELINE.json
    input_hint); this covers rows where only `html` is populated. A real
    crawl pipeline would use a proper extractor (trafilatura/jusText) as a
    pandas UDF — this keeps the cheap path JVM-side."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    s = c.cast("string")
    s = F.regexp_replace(s, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    s = F.regexp_replace(s, "(?s)<[^>]+>", " ")
    for ent, rep in [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", "\""), ("&#39;", "'"), ("&nbsp;", " ")]:
        s = F.regexp_replace(s, ent, rep)
    return F.trim(F.regexp_replace(s, "\\s+", " "))


def segment_sentences(pages: DataFrame, lang: str | None = "en") -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> sentences(url, sentence_id,
    sent_index, sentence, lang).

    The emitted ``sentence`` is CLEANED text (rm_special_char invariant,
    src/utils/data_clean.py:5-6 — cleaning precedes NER exactly as at
    src/language_model/spacy_loader.py:370).
    """
    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    # Fall back to html extraction when `text` is null/empty (still JVM-side)
    if "html" in df.columns:
        text = F.when(
            F.col("text").isNotNull() & (F.length("text") > 0), F.col("text")
        ).otherwise(html_to_text_col("html"))
    else:
        text = F.col("text")
    cleaned = df.select(
        "url",
        "lang",
        clean_text_col(text).alias("clean_text"),
    )
    sentences = cleaned.select(
        "url",
        "lang",
        F.posexplode(F.split(F.col("clean_text"), SENTENCE_SPLIT_REGEX)).alias(
            "sent_index", "sentence"
        ),
    ).filter(F.length(F.trim(F.col("sentence"))) > 0)
    return sentences.select(
        "url",
        F.concat_ws("#", F.col("url"), F.col("sent_index").cast("string")).alias(
            "sentence_id"
        ),
        F.col("sent_index").cast("int").alias("sent_index"),
        "sentence",
        "lang",
    )
