"""nhl_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference batch ELT platform (Cullen92/nhl-data-pipeline):
medallion bronze→staging→silver modeling, latest-snapshot dedup, nested-JSON
flattening, fuzzy entity resolution, rolling-window analytics, and the
large-scale training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Everything here is declarative DataFrame / Spark SQL so Catalyst+Tungsten pick
the physical plan; Python UDFs appear only where the built-ins genuinely
cannot express the semantics (and then as Arrow-batched Pandas UDFs).
"""

__version__ = "0.1.0"
