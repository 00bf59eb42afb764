"""graphraft_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of AlfredClemedtson/graphraft.

The reference (`/root/reference/`) is a Neo4j-backed graph-RAG pipeline; this
package re-expresses every operator as native Spark DataFrame plans:

- ``graph``     property-graph tables (nodes/edges as DataFrames) + ingest
- ``patterns``  structured pattern IR + join-plan compiler + enumeration
                (the reference's Cypher templates, path_retriever.py)
- ``search``    fulltext/normalized name matching + cosine KNN (ner.py,
                retriever.py vector queries)
- ``retrieve``  budgeted top-k retrieval dataflow (retriever.py)
- ``data``      batch dataset operators (llm1.py/llm2.py/notebook .map ops)
- ``metrics``   IR metrics (compute_metrics.py)
- ``llm``       pluggable model-scoring surface (mapInPandas seams)
- ``ops``       large-scale training-data pipeline operators (dedup,
                similarity search, text analysis, multimodal plumbing)
- ``streaming`` Structured Streaming ingestion/windowing over event streams
"""

__version__ = "0.1.0"
