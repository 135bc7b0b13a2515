#!/usr/bin/env python3
"""One-time generation of the static-block parquet fixture.

Parses the public GeoNames ontology v3.3 RDF/XML (the file the reference
merges into its output via rapper — ``docker-compose.yml:32-37``,
``scripts/merge_rdf_files.sh:12-21``) with ``sources/rdfxml.py``, appends
the ``property-definitions.ttl`` wdt:P439 block, and writes ONE parquet
file checked into the repo at ``sources/data/ontology_v33_static.parquet``
— the single static dimension both the Spark engine
(``sources/ontology.ontology_triples``) and the DuckDB oracle
(``read_parquet``) load, so the two sides agree byte-for-byte.

Usage: python3 scripts/gen_ontology_fixture.py [path-to-ontology.rdf]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geonames_rdf_spark.sources import ontology  # noqa: E402
from geonames_rdf_spark.sources.rdfxml import read_rdfxml_file  # noqa: E402

DEFAULT_SRC = "/root/reference/output/ontology_v3.3_modified.rdf"


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    rows = read_rdfxml_file(src) + ontology.property_definition_rows()
    cols = list(zip(*rows))
    table = pa.table(
        {
            "subj": pa.array(cols[0], pa.string()),
            "pred": pa.array(cols[1], pa.string()),
            "obj": pa.array(cols[2], pa.string()),
            "obj_is_iri": pa.array(cols[3], pa.bool_()),
            "obj_lang": pa.array(cols[4], pa.string()),
            "obj_dt": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, ontology.FIXTURE_PATH, compression="zstd")
    print(f"wrote {len(rows)} triples -> {ontology.FIXTURE_PATH}")


if __name__ == "__main__":
    main()
