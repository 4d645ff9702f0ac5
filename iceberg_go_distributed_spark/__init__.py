"""PySpark-native analytics engine with the capabilities of
``lamOrigin007/iceberg-go-distributed`` (an iceberg-go fork with a
distributed snapshot commit protocol).

Architecture (see SURVEY.md):
  - metadata plane: driver-side pure Python (metadata JSON, manifests,
    snapshots, transactions, four-level scan pruning)
  - data plane: Spark DataFrames (Parquet scan/write, filter/project/limit,
    plus everything Spark supplies natively)
  - the fork's distributed-snapshot protocol maps onto Spark's
    driver(coordinator)/executor(worker) split and is our default write path
  - beyond-reference LLM-pipeline operators (dedup, similarity search,
    text analysis, multimodal columns) live in ``operators/``
"""

__version__ = "0.1.0"
