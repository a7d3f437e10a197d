"""Structured Streaming layer (SURVEY §2.9): the Spark-native form of the
reference's polling scheduler — triggers, checkpointed offsets, windowed
event-time aggregation with watermarks, and foreachBatch ledger writes.
"""
