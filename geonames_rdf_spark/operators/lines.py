"""Cross-corpus line-level exact dedup (C4-style boilerplate removal).

C4 (Raffel et al. 2020, §2.2) discards every repeated occurrence of a
three-sentence span across the WHOLE corpus, keeping exactly one; the
same pass is what strips cookie banners / nav bars / license footers
that survive per-document cleaning.  This is the line-granular version:
a line is kept only at its globally-first occurrence — smallest
``(doc_id, pos)`` over every document that contains it, which also
removes repeats WITHIN a document — and every document is reassembled
from its surviving lines in original order.

Scale shape (10^12 docs, the whole point of the pass):

* Lines are keyed by ``md5(line)`` for the global-winner aggregation,
  so the wide shuffle moves 32-byte keys + two ints, never line text.
  (md5 because both engines compute it identically; a 128-bit key makes
  collisions a non-issue at any corpus size.)
* The winner per key is ``min(struct(doc_id, pos))`` — a hash aggregate
  with map-side partial combine, so a boilerplate line occurring 10^9
  times contributes ONE candidate per map task to the exchange (the
  Zipf head of repeated lines is exactly the skew this absorbs).
* Keeping is an inner join back on ``(key, doc_id, pos)`` — the winner
  side is one row per DISTINCT line, already shuffled by key.
* Reassembly is one aggregation keyed by ``doc_id`` (sort the kept
  ``(pos, line)`` structs inside the group, not a global sort).  The
  aggregation buffer holds ONE document's surviving lines — the same
  memory bound as materializing that document's text anywhere else in
  the pipeline, and nothing like a corpus-sized group.

``min_chars`` exempts short lines from dedup entirely (C4 applies its
span filter only to long-enough spans; deduping one-word lines would
shred ordinary prose) — exempt lines skip the wide shuffle too.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_lines(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", sep: str = "\n",
                min_chars: int = 0) -> DataFrame:
    """One row per input document: ``text`` rebuilt from the lines that
    survive global first-occurrence dedup, plus kept/removed counts.
    Documents whose every line is removed come back with empty text
    (and ``n_lines_kept = 0``) — they stay visible so a downstream
    length filter can drop them explicitly.
    """
    # sep is a LITERAL separator on both engines (Spark's split takes a
    # regex, so escape it; DuckDB's string_split is literal already)
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep)))
        .alias("pos", "line"))
    dedupable = lines.filter(F.length("line") >= min_chars) \
        .withColumn("_k", F.md5("line"))
    exempt = lines.filter(F.length("line") < min_chars)

    winners = (dedupable.groupBy("_k")
               .agg(F.min(F.struct("doc_id", "pos")).alias("_w"))
               .select("_k", F.col("_w.doc_id").alias("doc_id"),
                       F.col("_w.pos").alias("pos")))
    kept = dedupable.join(winners, ["_k", "doc_id", "pos"]) \
        .select("doc_id", "pos", "line") \
        .unionByName(exempt)

    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s.line),
                        sep).alias("text"),
                    F.count(F.lit(1)).alias("n_lines_kept")))
    totals = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n_total"))
    return (totals.join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("text"), F.lit("")).alias("text"),
                    F.coalesce(F.col("n_lines_kept"), F.lit(0))
                    .cast("int").alias("n_lines_kept"),
                    (F.col("_n_total") -
                     F.coalesce(F.col("n_lines_kept"), F.lit(0)))
                    .cast("int").alias("n_lines_removed")))


def dedup_lines_sql(docs_sql: str, sep: str = "\n",
                    min_chars: int = 0, id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """DuckDB rendering of the SAME semantics (independent formulation:
    window rank over the line text itself instead of the md5-key
    aggregate-and-join) — for oracle rows and parity tests."""
    sep_sql = sep.replace("'", "''").replace("\n", "' || chr(10) || '")
    return f"""
WITH lines AS (
  SELECT {id_col} AS doc_id, u.pos - 1 AS pos, u.line
  FROM ({docs_sql}) d,
       LATERAL (SELECT UNNEST(string_split(d.{text_col},
                                           '{sep_sql}')) AS line,
                       generate_subscripts(string_split(d.{text_col},
                                           '{sep_sql}'), 1) AS pos) u
),
ranked AS (
  SELECT doc_id, pos, line,
         CASE WHEN length(line) < {min_chars} THEN 1
              ELSE ROW_NUMBER() OVER (
                PARTITION BY CASE WHEN length(line) >= {min_chars}
                                  THEN line END
                ORDER BY doc_id, pos) END AS rn
  FROM lines
),
kept AS (SELECT doc_id, pos, line FROM ranked WHERE rn = 1),
totals AS (SELECT doc_id, COUNT(*) AS n_total FROM lines GROUP BY doc_id),
rebuilt AS (
  SELECT doc_id,
         string_agg(line, '{sep_sql}' ORDER BY pos) AS text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.text, '') AS text,
       CAST(COALESCE(r.n_kept, 0) AS INT) AS n_lines_kept,
       CAST(t.n_total - COALESCE(r.n_kept, 0) AS INT) AS n_lines_removed
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""
