"""instagram_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capabilities of the reference pipeline (Dante134/instagram_data_pipeline):
a relational property-graph model (users + follower/following edges),
derived mutual-follower edges, interest enrichment via a pluggable batched
model call, a job-ledger scheduler with quotas — plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Design: DataFrame/SQL-first; Catalyst does the optimization. Custom code is
limited to write protocols (upsert emulation over Parquet), the pluggable
model UDF (mapInPandas), and extension operators composed from built-ins.
"""

__version__ = "0.1.0"
