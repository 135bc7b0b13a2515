"""Triple-set precision/recall (the BASELINE.json headline metric).

P/R is computed on canonical N-Triples term identity — the same notion the
reference's manual output comparison uses (web/docs.html 'Feature
Comparisons') made automatic: distinct (subj, pred, rendered-term) sets,
compared with two left-anti joins (no collect; scales to any triple
count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geonames_rdf_spark.functions.terms import nt_term


def _canon(triples: DataFrame) -> DataFrame:
    return triples.select(
        "subj", "pred",
        nt_term(F.col("obj"), F.col("obj_is_iri"),
                F.col("obj_lang"), F.col("obj_dt")).alias("term"),
    ).distinct()


def triple_pr(got: DataFrame, want: DataFrame) -> dict[str, float]:
    g = _canon(got).cache()
    w = _canon(want).cache()
    n_got = g.count()
    n_want = w.count()
    tp = g.join(w, ["subj", "pred", "term"], "left_semi").count()
    g.unpersist(); w.unpersist()
    precision = tp / n_got if n_got else 1.0
    recall = tp / n_want if n_want else 1.0
    return {
        "precision": round(precision, 6),
        "recall": round(recall, 6),
        "tp": tp, "got": n_got, "want": n_want,
    }
