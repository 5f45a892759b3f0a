"""PySpark-native analytics engine with the capability surface of
sngmng6506/vectordb-acc-and-speed-exp (a ChromaDB HNSW latency/recall
benchmark study), re-expressed Spark-first for 100 TB scale.

Layout:
    session     SparkSession factory with scale-oriented defaults
    io          table catalog over the parquet test corpus
    functions   vector / text / portable-hash column expressions
    operators   knn, ann, recall, dedup, textstats, multimodal, snapshots
    plans       benchmark harness (warm-up, timed runs, stat rollups, sinks)
    streaming   Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
