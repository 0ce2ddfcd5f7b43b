"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference `dominiquehill0531/BankCreditUnion-DataPipeline`
(a medallion bronze->silver->gold batch ETL over FDIC/NCUA data), rebuilt
Spark-first as a composable library.

Layout (SURVEY.md §7.1):
  session     - single SparkSession factory (vs. per-module builders in the
                reference, pipeline1.py:14-34)
  schemas     - StructType layer contracts (silverLayer/BuildSilverLayer.py:62-78,
                goldLayer/BuildGoldLayer.py:52-62)
  sources/    - file scans + REST/zip ingest adapters (SURVEY §2.1)
  operators/  - clean / conform / analytics / dedup / similarity / text /
                multimodal (SURVEY §2.3-2.8 + LLM-data extensions)
  functions/  - scalar/vector helpers built on pyspark.sql.functions
  plans/      - medallion pipeline assembly (bronze->silver->gold)
  streaming/  - incremental checkpointed ingest + windowed aggs (SURVEY §2.9)
  sinks       - parquet/delta partitioned writers (SURVEY §2.2)
"""

__version__ = "0.1.0"
