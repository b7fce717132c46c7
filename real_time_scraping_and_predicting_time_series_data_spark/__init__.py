"""PySpark-native analytics engine with the capabilities of
``iskander1997/Real-time-scraping-and-predicting-time-series-data``.

The reference is a real-time tick pipeline (HTTP poll -> change-dedup ->
anchored variation -> sliding-window LSTM forecast -> as-of alignment ->
rolling RMSE -> CSV sinks). This package re-expresses every one of those
dataflow operators — plus the standard relational set and large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) — as declarative, Catalyst-optimizable Spark operators
designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession builder with scale-aware defaults
- ``catalog``    : fixed StructType schemas + parquet loading / view registry
- ``operators/`` : batch operators (dedup, variation, windows, asof, metrics,
                   scaling, relational, similarity, text, multimodal)
- ``sources/``   : source/sink adapters (file poll drop-zone, JSON extraction,
                   csv/parquet sinks)
- ``functions/`` : reusable column expression builders (vector math, text)
- ``streaming/`` : Structured Streaming twins of the reference pipeline
- ``ml/``        : forecasting (lag-feature regression; M1-M4)
- ``plans/``     : query registry mapping names -> (spark_fn, oracle_sql)
"""

__version__ = "0.1.0"
