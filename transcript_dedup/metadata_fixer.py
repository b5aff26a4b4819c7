"""Metadata repair stage — the ``fix-metadata`` workflow analogue.

Graft of the reference's metadata fixer + inference
(/root/reference/src/metadata-fixer.ts:29-178, src/inference.ts:34-47):
records with missing metadata fields are found (findFilesWithMissingMetadata
/ getMissingFields), the missing values are inferred from the record's OWN
content (the parseFilename analogue — the reference derives artist/title
from the file's name; a document corpus derives language from its stopword
profile and a source label from its leading token), and each repair carries
a confidence ('medium' when every missing field was inferable, else 'low' —
inference.ts:44) and a source-of-inference label. Records whose fields stay
missing after inference are the skip set (S11): counted, never silently
dropped.

Everything is built-in column expressions — one projection, no shuffle, no
Python — so the stage runs at scan speed at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .normalize import normalize_text

#: shared with the language-ID query (__spark_entry__ doc_lang_stopword)
STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")


def find_missing_metadata(
    docs: DataFrame, fields: tuple[str, ...] = ("lang", "source")
) -> DataFrame:
    """Records with at least one missing (null/blank) metadata field —
    findFilesWithMissingMetadata (metadata-fixer.ts:29-44)."""
    cond = None
    for f in fields:
        c = F.col(f).isNull() | (F.trim(F.col(f)) == "")
        cond = c if cond is None else (cond | c)
    return docs.filter(cond)


def _inferred_lang(norm_col: str) -> F.Column:
    """Stopword-ratio language heuristic: >= 5% English stopwords -> 'en',
    else not inferable (null) — the conservative arm of inferMetadata."""
    toks = F.split(F.col(norm_col), " ")
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(
        (F.size(toks) > 0) & (stop >= 0.05 * F.size(toks)), F.lit("en")
    ).otherwise(F.lit(None).cast("string"))


def _inferred_source(norm_col: str) -> F.Column:
    """Leading-token source label — the parseFilename analogue
    (src/parser.ts first-separator split): the record's own identity string
    yields the field; tokens shorter than 3 chars are not inferable."""
    head = F.element_at(F.split(F.col(norm_col), " "), 1)
    return F.when(F.length(head) >= 3, F.concat(F.lit("inferred:"), head)).otherwise(
        F.lit(None).cast("string")
    )


def fix_document_metadata(
    docs: DataFrame,
    counters: dict | None = None,
    text_col: str = "text",
) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) -> repaired rows.

    Output adds: fixed_fields (comma-joined), confidence
    ('medium' | 'low' | '' when nothing was missing), inference_source.
    Rows with a field still missing after inference are flagged
    ``skipped`` (S11) and counted.
    """
    d = docs.withColumn("_norm", normalize_text(text_col))
    missing_lang = F.col("lang").isNull() | (F.trim("lang") == "")
    missing_source = F.col("source").isNull() | (F.trim("source") == "")
    inf_lang = _inferred_lang("_norm")
    inf_source = _inferred_source("_norm")

    fixed_lang = F.when(missing_lang, inf_lang).otherwise(F.col("lang"))
    fixed_source = F.when(missing_source, inf_source).otherwise(F.col("source"))

    n_missing = missing_lang.cast("int") + missing_source.cast("int")
    n_fixed = (missing_lang & inf_lang.isNotNull()).cast("int") + (
        missing_source & inf_source.isNotNull()
    ).cast("int")

    out = d.select(
        *[c for c in docs.columns if c not in ("lang", "source")],
        fixed_lang.alias("lang"),
        fixed_source.alias("source"),
        F.concat_ws(
            ",",
            F.filter(
                F.array(
                    F.when(missing_lang & inf_lang.isNotNull(), F.lit("lang")),
                    F.when(missing_source & inf_source.isNotNull(), F.lit("source")),
                ),
                lambda x: x.isNotNull(),
            ),
        ).alias("fixed_fields"),
        # confidence semantics from inference.ts:44 — every missing field
        # inferred -> 'medium'; anything uninferable -> 'low'
        F.when(n_missing == 0, F.lit(""))
        .when(n_fixed == n_missing, F.lit("medium"))
        .otherwise(F.lit("low"))
        .alias("confidence"),
        F.when(n_fixed > 0, F.lit("parsed-from-content"))
        .otherwise(F.lit(""))
        .alias("inference_source"),
        (n_fixed < n_missing).alias("skipped"),
    )
    if counters is not None:
        row = out.agg(
            F.sum(F.col("skipped").cast("long")).alias("skipped"),
            F.sum((F.length("fixed_fields") > 0).cast("long")).alias("fixed"),
        ).collect()[0]
        counters["metadata_skipped"] = int(row["skipped"] or 0)
        counters["metadata_fixed"] = int(row["fixed"] or 0)
    return out


def fix_turn_roles(turns: DataFrame) -> DataFrame:
    """Transcript-side repair: turns with a missing role get the parity
    inference (even turn_idx -> 'user', odd -> 'assistant') — the structural
    analogue of inferring artist/title from filename position."""
    missing = F.col("role").isNull() | (F.trim("role") == "")
    inferred = F.when(F.col("turn_idx") % 2 == 0, F.lit("user")).otherwise(
        F.lit("assistant")
    )
    # flag first: overwriting `role` below would make `missing` re-resolve
    # against the repaired column
    return turns.withColumn("role_inferred", missing).withColumn(
        "role", F.when(F.col("role_inferred"), inferred).otherwise(F.col("role"))
    )
