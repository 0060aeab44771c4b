"""adcirctime2cogs_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of RENCI/adcircTime2cogs (reference surveyed in SURVEY.md):
mesh→raster regridding as DataFrame joins/aggregations, plus the full
relational operator suite, LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns), and Structured Streaming.

Design stance (SURVEY.md §7): DataFrame-only, explicit schemas, AQE on,
Arrow-vectorized pandas UDFs only where built-ins can't express the
semantics (NetCDF ingest, COG sink). No RDDs, no driver-side loops.
"""

from adcirctime2cogs_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
