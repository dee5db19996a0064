"""wikipedia_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``AmoghKatwe/Wikipedia_Data_Pipeline`` (a Java
threads+S3 TF-IDF batch ETL — see SURVEY.md), extended with the
relational, dedup, similarity-search, text-analysis and streaming
operators a large-scale training-data pipeline needs.

Design principles (SURVEY.md §7):
  * DataFrame/SQL everywhere — Catalyst plans, Tungsten executes.
  * No driver-side loops, no collect() in transforms, no file IR.
  * Broadcast small sides, one shuffle per logical re-key, AQE on.
  * Python UDFs only where built-ins genuinely cannot express the op.
"""

__version__ = "0.1.0"

from wikipedia_data_pipeline_spark.session import get_spark
from wikipedia_data_pipeline_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["get_spark", "TABLE_NAMES", "load_table", "load_tables", "__version__"]
