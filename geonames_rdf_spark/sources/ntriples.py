"""N-Triples source: parse .nt lines back into the 6-column triple table
(SURVEY.md §2.A8 — the reference round-trips RDF through `rapper`; our
native interchange format is N-Triples text, so the parser closes the
loop sink->source).

Pure `regexp_extract` Column expressions — the grammar subset is exactly
what our sink emits: IRI or blank-node (``_:bN``) subjects/objects,
plain/lang-tagged/typed literals with the canonical ``\\ " \\n \\r \\t``
escapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_LINE = (
    r'^(?:<([^>]*)>|(_:[A-Za-z0-9]+)) <([^>]*)> '
    r'(?:<([^>]*)>|(_:[A-Za-z0-9]+)'
    r'|"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?)'
    r' \.$'
)

# a character our sink can never emit inside a literal (it would have
# been escaped) — used as the two-phase unescape sentinel below
_SENTINEL = "\x00"


def _unescape(lit: Column) -> Column:
    """Decode ``\\\\ \\" \\n \\r \\t``.

    Two-phase: escaped backslashes become a sentinel FIRST, so the ``n``
    in ``\\\\n`` (escaped backslash + letter n) is not mistaken for a
    newline escape; the sentinel is restored last."""
    out = F.regexp_replace(lit, r"\\\\", _SENTINEL)
    out = F.regexp_replace(out, r'\\"', '"')
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r"\\r", "\r")
    out = F.regexp_replace(out, r"\\t", "\t")
    return F.regexp_replace(out, _SENTINEL, r"\\")


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    g = lambda i: F.regexp_extract("value", _LINE, i)  # noqa: E731
    parsed = lines.select(
        g(1).alias("_subj_iri"),
        g(2).alias("_subj_bn"),
        g(3).alias("pred"),
        g(4).alias("_obj_iri"),
        g(5).alias("_obj_bn"),
        g(6).alias("_obj_lit"),
        g(7).alias("_lang"),
        g(8).alias("_dt"),
    )
    obj_iri = F.when(F.col("_obj_iri") != "", F.col("_obj_iri")).otherwise(
        F.col("_obj_bn"))
    return parsed.filter(
        (F.col("_subj_iri") != "") | (F.col("_subj_bn") != "")
    ).select(
        F.when(F.col("_subj_iri") != "", F.col("_subj_iri"))
        .otherwise(F.col("_subj_bn")).alias("subj"),
        "pred",
        F.when(obj_iri != "", obj_iri)
        .otherwise(_unescape(F.col("_obj_lit"))).alias("obj"),
        (obj_iri != "").alias("obj_is_iri"),
        F.when(F.col("_lang") != "", F.col("_lang")).alias("obj_lang"),
        F.when(F.col("_dt") != "", F.col("_dt")).alias("obj_dt"),
    )
