"""geonames_rdf_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, idiomatic-Spark reimplementation of the *capabilities* of the
reference pipeline ``nnaisha2/geonames-rdf`` (bash/awk + SPARQL-Anything):
GeoNames-style gazetteer shaping, row->triple RDF mapping, a SPARQL-shaped
analytical query workload, and — generalized per the project north star — a
web-scale KG-construction front (HTML text extraction, Aho-Corasick toponym
mention detection, entity linking, canonicalization) plus the training-data
pipeline operators (dedup, similarity search, text analysis).

Everything is expressed DataFrame-first so Catalyst/AQE pick physical plans;
Python appears only in Arrow-vectorized UDF stages.
"""

__version__ = "0.1.0"
