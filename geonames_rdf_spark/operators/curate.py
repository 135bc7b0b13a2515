"""Composite corpus-curation pipeline: the end-to-end shape a
training-data run executes before tokenization.

One lazy plan chaining the already-verified primitives:

1. **exact dedup** — keep the min-id survivor per distinct text
   (``dedup.exact_dedup`` rule, applied as a semi-join);
2. **quality gate** — drop documents under a score threshold
   (``textstats.quality_score``, same 6-dp rounding contract);
3. **stratified downsampling** — per-source keep rates via the
   hash-deterministic sampler (``sampling.sample_stratified``);
4. optional gates, each off by default (the oracle twin checks the
   default wiring): **benchmark decontamination**
   (``dedup.decontaminate``), **repetition caps**
   (``textstats.repetition_stats``, Gopher rules), **LM perplexity cap**
   (``textstats.lm_perplexity`` with a pre-trained broadcast LM), and
   the r05 **PII-density cap** (``privacy.redact_pii`` counts — drop
   documents whose placeholder count exceeds ``max_pii``; redaction
   itself is a rewrite, not a filter, so it stays a separate operator).

Each stage is individually oracle-checked; the composite has its own
DuckDB twin (driver query ``curate_corpus``) so stage WIRING is verified
too, not just the parts.  Shuffle inventory at corpus scale: one
groupBy(md5) for dedup + the broadcast-sized survivor semi-join — quality
and sampling are narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geonames_rdf_spark.operators import sampling, textstats
from geonames_rdf_spark.operators.dedup import exact_dedup


def curate_corpus(docs: DataFrame, min_quality: float = 0.4,
                  rates: dict[str, float] | None = None,
                  default_rate: float = 1.0,
                  text_col: str = "text",
                  id_col: str = "doc_id",
                  decontam_benchmark: DataFrame | None = None,
                  decontam_ngram: int = 13,
                  max_dup_line_frac: float | None = None,
                  max_top_bigram_share: float | None = None,
                  lm: dict | None = None,
                  max_ppl: float | None = None,
                  drop_unmeasurable: bool = False,
                  max_pii: int | None = None) -> DataFrame:
    """(doc_id, source, lang, quality) for the curated subset."""
    if id_col != "doc_id":
        # textstats.quality_score keys its output on doc_id; renaming
        # support would silently join wrong columns, so refuse instead
        raise ValueError("curate_corpus requires id_col='doc_id'"
                         " (quality_score contract)")
    if max_ppl is not None and lm is None:
        raise ValueError("max_ppl requires a trained lm"
                         " (textstats.train_char_lm)")
    survivors = (exact_dedup(docs, text_col, id_col)
                 .select(F.col("keep_id").alias(id_col)))
    d = docs.join(survivors, id_col, "left_semi")
    q = textstats.quality_score(d, text_col)
    d = (d.join(q, id_col)
         .filter(F.col("quality") >= min_quality))
    if decontam_benchmark is not None:
        from geonames_rdf_spark.operators.dedup import decontaminate

        clean = (decontaminate(d, decontam_benchmark, n=decontam_ngram,
                               text_col=text_col, id_col=id_col)
                 .filter(~F.col("contaminated")).select(id_col))
        d = d.join(clean, id_col, "left_semi")
    if max_dup_line_frac is not None or max_top_bigram_share is not None:
        rep = textstats.repetition_stats(d, text_col)
        keep = F.lit(True)
        if max_dup_line_frac is not None:
            keep = keep & (F.col("dup_line_frac") <= max_dup_line_frac)
        if max_top_bigram_share is not None:
            keep = keep & (F.col("top_bigram_share") <= max_top_bigram_share)
        d = d.join(rep.filter(keep).select(id_col), id_col, "left_semi")
    if max_ppl is not None:
        # NULL ppl means "too short to measure" per lm_perplexity's
        # contract — NOT "bad".  Keep unmeasurable docs unless the caller
        # explicitly opts into dropping them.
        keep_ppl = F.col("ppl").isNull() | (F.col("ppl") <= max_ppl)
        if drop_unmeasurable:
            keep_ppl = F.col("ppl").isNotNull() & (F.col("ppl") <= max_ppl)
        ok = (textstats.lm_perplexity(d, lm, text_col)
              .filter(keep_ppl)
              .select(id_col))
        d = d.join(ok, id_col, "left_semi")
    if max_pii is not None:
        from geonames_rdf_spark.operators.privacy import redact_pii

        ok = (redact_pii(d, text_col, id_col)
              .filter(F.col("n_pii") <= max_pii).select(id_col))
        d = d.join(ok, id_col, "left_semi")
    if rates:
        d = sampling.sample_stratified(d, rates, id_col=id_col,
                                       default_rate=default_rate)
    return d.select(id_col, "source", "lang", "quality")
