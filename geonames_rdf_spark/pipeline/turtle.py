"""Turtle sink (A6): prefixed, subject-grouped serialization.

The reference's native output format is Turtle (``map.sh:61-65`` writes
``places.ttl``/``alternateNames.ttl``; ``merge_rdf_files.sh:12-21``
concatenates them).  N-Triples stays the distributed-friendly default
(``materialize.write_ntriples`` — line-independent, splittable); this
module adds the Turtle form:

- IRIs compact to prefixed names against the reference's PREFIX block
  when the local part is a safe PN_LOCAL, else stay ``<...>``;
- triples group by subject into ``subj p1 o1 ;\\n    p2 o2 .`` blocks
  (deterministically sorted within the block);
- every PARTITION emits its own @prefix header — re-declaring a prefix
  is legal Turtle, so each part file is a valid document AND plain
  concatenation (the reference's merge step) stays valid.  No
  single-file coalesce is forced at scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geonames_rdf_spark import vocab

# reference PREFIX block (places.rq:1-10, consolidate.rq:1-5)
PREFIXES: dict[str, str] = {
    "gn": vocab.GN,
    "wgs84_pos": vocab.WGS84,
    "rdf": vocab.RDF,
    "rdfs": vocab.RDFS,
    "xsd": vocab.XSD,
    "foaf": vocab.FOAF,
    "dcterms": vocab.DCTERMS,
    "cc": vocab.CC,
    "owl": vocab.OWL,
    "skos": vocab.SKOS,
    "wdt": vocab.WDT,
}

# conservative PN_LOCAL: leading letter/underscore, then word chars,
# medial dots allowed but not trailing (Turtle grammar's '.' ambiguity)
_PN_LOCAL = r"^[A-Za-z_][A-Za-z0-9_.\-]*$"


def turtle_header() -> str:
    return "\n".join(
        f"@prefix {p}: <{ns}> ." for p, ns in sorted(PREFIXES.items())
    )


def _compact_iri(col: Column) -> Column:
    """Prefixed name when the IRI splits into a known namespace + safe
    local part, else ``<iri>``."""
    out = F.concat(F.lit("<"), col, F.lit(">"))
    for p, ns in PREFIXES.items():
        local = F.substring(col, len(ns) + 1, 1 << 20)
        ok = (
            col.startswith(ns)
            & local.rlike(_PN_LOCAL)
            & ~local.endswith(".")
        )
        out = F.when(ok, F.concat(F.lit(p + ":"), local)).otherwise(out)
    return out


def _turtle_object(obj, obj_is_iri, obj_lang, obj_dt) -> Column:
    """Object term: compacted IRI, or the N-Triples literal form with the
    datatype IRI compacted (xsd:integer etc.)."""
    esc = F.regexp_replace(F.regexp_replace(obj, r"\\", r"\\\\"), '"', r'\\"')
    quoted = F.concat(F.lit('"'), esc, F.lit('"'))
    return (
        F.when(obj_is_iri, _compact_iri(obj))
        .when(obj_lang.isNotNull(), F.concat(quoted, F.lit("@"), obj_lang))
        .when(obj_dt.isNotNull(),
              F.concat(quoted, F.lit("^^"), _compact_iri(obj_dt)))
        .otherwise(quoted)
    )


def to_turtle_blocks(triples: DataFrame) -> DataFrame:
    """One row per subject: the sorted predicate-object block.

    Pure Column pipeline — ONE shuffle (the subject groupBy); rendering
    and sorting happen in the aggregation's array functions, JVM-side.
    ``rdf:type`` renders as Turtle's ``a`` shorthand.
    """
    pred_txt = F.when(
        F.col("pred") == vocab.RDF_TYPE, F.lit("a")
    ).otherwise(_compact_iri(F.col("pred")))
    po = F.struct(
        pred_txt.alias("p"),
        _turtle_object(F.col("obj"), F.col("obj_is_iri"),
                       F.col("obj_lang"), F.col("obj_dt")).alias("o"),
    )
    grouped = triples.groupBy("subj").agg(
        F.array_sort(F.collect_list(po)).alias("po")
    )
    body = F.concat_ws(
        " ;\n    ",
        F.transform("po", lambda x: F.concat_ws(" ", x["p"], x["o"])),
    )
    return grouped.select(
        F.col("subj").alias("_subj"),
        F.concat(_compact_iri(F.col("subj")), F.lit(" "), body,
                 F.lit(" .")).alias("line"),
    )


def to_turtle(triples: DataFrame, sort: bool = False) -> DataFrame:
    """Turtle block lines; ``sort=True`` pins a global subject order
    (the reference's ORDER BY ?uri in consolidate.rq:66 — use only for
    golden comparisons, it forces a range-partition sort)."""
    blocks = to_turtle_blocks(triples)
    if sort:
        blocks = blocks.orderBy("_subj")
    return blocks.select("line")


def write_turtle(triples: DataFrame, path: str, mode: str = "overwrite",
                 sort: bool = False) -> None:
    """Write part files that are each a complete Turtle document (header
    per partition) and whose concatenation is also valid Turtle."""
    hdr = turtle_header()

    def add_header(batches):
        first = True
        for pdf in batches:
            if first and len(pdf):
                pdf = pd.concat(
                    [pd.DataFrame({"line": [hdr]}), pdf], ignore_index=True
                )
                first = False
            yield pdf

    (to_turtle(triples, sort=sort)
     .mapInPandas(add_header, "line string")
     .write.mode(mode).text(path))
