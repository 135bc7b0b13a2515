"""N-Triples source: parse .nt lines back into the 6-column triple table
(SURVEY.md §2.A8 — the reference round-trips RDF through `rapper`; our
native interchange format is N-Triples text, so the parser closes the
loop sink->source).

Pure `regexp_extract` Column expressions — the grammar subset is exactly
what our sink emits (IRIs, plain/lang-tagged/typed literals with \" and
\\\\ escapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LINE = (
    r'^<([^>]*)> <([^>]*)> '
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?)'
    r' \.$'
)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    g = lambda i: F.regexp_extract("value", _LINE, i)  # noqa: E731
    parsed = lines.select(
        g(1).alias("subj"),
        g(2).alias("pred"),
        g(3).alias("_obj_iri"),
        g(4).alias("_obj_lit"),
        g(5).alias("_lang"),
        g(6).alias("_dt"),
    )
    unesc = F.regexp_replace(
        F.regexp_replace(F.col("_obj_lit"), r'\\"', '"'), r"\\\\", r"\\"
    )
    return parsed.filter(F.col("subj") != "").select(
        "subj", "pred",
        F.when(F.col("_obj_iri") != "", F.col("_obj_iri")).otherwise(unesc).alias("obj"),
        (F.col("_obj_iri") != "").alias("obj_is_iri"),
        F.when(F.col("_lang") != "", F.col("_lang")).alias("obj_lang"),
        F.when(F.col("_dt") != "", F.col("_dt")).alias("obj_dt"),
    )
