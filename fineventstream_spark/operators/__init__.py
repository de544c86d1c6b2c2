"""Composed operators the built-in DataFrame API lacks as single calls:
as-of join, dedup family, similarity search, text analysis, multimodal
column plumbing. All are DataFrame→DataFrame functions — usable in batch
and (where stateless) inside ``foreachBatch`` streaming sinks.
"""
