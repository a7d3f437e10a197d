"""Pipeline lifecycles (SURVEY §3): the manual 5-stage DAG, the
queue-driven scheduler, and the analysis poll loop — composed from the
operator library over a Parquet warehouse.
"""
