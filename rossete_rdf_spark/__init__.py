"""rossete_rdf_spark — a PySpark-native RML knowledge-graph construction engine.

A from-scratch re-implementation of the query/data-processing capabilities of
the reference engine RubenCid35/rossete-rdf (Rust, /root/reference), expressed
as Spark DataFrame transforms + vectorized Arrow UDFs instead of
threads + SQLite staging.

Layout:
  rml/       RML mapping parser (pure Python) + Spark compiler + writers
  graph/     connected components (large-star/small-star), MinHash-LSH
  pipeline/  web-scale KG construction: page table -> extract -> mentions ->
             entity linking -> canonicalization -> triples, with checkpoints
  textops/   training-data ops: dedup family, similarity search, text analysis
  streaming/ structured-streaming variants of the event operators
"""

__version__ = "0.1.0"
