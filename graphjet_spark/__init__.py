"""graphjet_spark — a PySpark-native link-graph analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of GraphJet (reference: /root/reference, twitter/GraphJet,
VLDB'16).  GraphJet is a single-server in-memory real-time graph index;
this engine is a batch, DataFrame/Arrow-UDF, multi-executor analytics
engine over columnar tables.

Sub-packages
------------
``session``     SparkSession factory (AQE, Arrow, tuned shuffle partitions).
``sources``     Table loaders: driver testdata, synthesized web pages,
                canonical graph-edge derivations.
``functions``   Column-expression libraries (url/text extraction, hashing,
                similarity normalizations, text statistics, vectors).
``operators``   GraphJet query-surface analogues: degrees, top-k,
                second-degree-by-count, intersection similarity, social
                proof, SALSA, filters, sampling, dedup, ANN.
``plans``       Iterative superstep algorithms (PageRank, connected
                components, label propagation, triangle count), CSR-like
                adjacency blocks, checkpoint/metrics management.
``streaming``   Structured Streaming edge-ingest path.
"""

__version__ = "0.1.0"
