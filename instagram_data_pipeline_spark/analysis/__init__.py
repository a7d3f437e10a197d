"""Interest-analysis layer (SURVEY §2.11 U1/U2): batched model inference
as a table function, with a pluggable, deterministic-by-default model.
"""
