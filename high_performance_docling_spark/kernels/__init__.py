"""Page/document-local deterministic kernels.

Pure Python + NumPy, no Spark imports — these run inside Arrow UDF stages
(mapInArrow / applyInPandas) AND inside the serial oracle, so Spark-vs-
oracle span equality is exact by construction while the Spark plumbing
(schemas, partitioning, shuffles, checkpoints) is what the tests exercise.
"""
