"""Scalar/column function library (SURVEY §2.10 + §2.12 text/embedding).

Everything here returns Column expressions built from
``pyspark.sql.functions`` — JVM-side, codegen-friendly; no Python UDFs in
the hot path.
"""
