"""Ring [R] as Structured Streaming: the reference's two pipelines
re-expressed as streaming queries over the same pure DataFrame transforms
used in batch (pipelines.py), plus the stateful high-water dedup
(state.py) and the partitioned streaming sink (sink.py).
"""
