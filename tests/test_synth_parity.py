"""The synthesis SQL must produce bit-identical tables in Spark and DuckDB —
this is the foundation of every oracle comparison."""

from __future__ import annotations

import pytest

from geonames_rdf_spark import synth
from tests.conftest import SF, assert_df_parity


@pytest.fixture(scope="module")
def gaz(spark):
    return synth.register_gazetteer(spark, SF)


@pytest.mark.parametrize("name", ["features", "features_plus", "alt_names",
                                  "hierarchy_raw", "ags_map"])
def test_table_parity(gaz, duck, name):
    deps = {
        "features": ["features"],
        "features_plus": ["features", "features_plus"],
        "alt_names": ["alt_names"],
        "hierarchy_raw": ["hierarchy_raw"],
        "ags_map": ["ags_map"],
    }[name]
    sql = synth.oracle_ctes(*deps) + f"\nSELECT * FROM {name}"
    sdf = gaz[name]
    if name in ("features", "features_plus"):
        # dates compare as strings (pandas dtype differs, values identical)
        sdf = sdf.withColumn(
            "modification_date", sdf.modification_date.cast("string")
        )
        sql = synth.oracle_ctes(*deps) + (
            "\nSELECT * REPLACE (CAST(modification_date AS STRING)"
            f" AS modification_date) FROM {name}"
        )
    assert_df_parity(sdf, duck.execute(sql).df())


def test_feature_edge_rows(gaz):
    rows = {r["geonameid"]: r for r in gaz["features_plus"].collect()}
    # k=0: population NULL (k%23=0) -> row later dropped by required-pattern
    assert rows[0]["population"] is None
    # k=6: population 0 (k%6=0, k%23!=0)
    assert rows[6]["population"] == 0
    # k=11: dem sentinel -9999
    assert rows[11]["dem"] == -9999
    # k=112: admin3 'NONE' sentinel (k%7=0)
    assert rows[112]["admin3_code"] == "NONE"
    # k=114: no admin1 at all (k%19=0) -> hierarchy-only parent path
    assert rows[114]["admin1_code"] == ""
    # derived keys per download.sh:87
    assert rows[0]["adm1"] == "C0." and rows[0]["adm2"] == "NONE"
    assert rows[110]["adm1"] == "C0.1" and rows[110]["adm2"] == "C0.1.1"
