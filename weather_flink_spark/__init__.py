"""weather_flink_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``getYourWeather/weather-flink`` pipeline (see SURVEY.md) as an idiomatic
Spark DataFrame / SQL / Structured Streaming engine, extended with the
LLM-data-pipeline operator set (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB scale.

Layout:
    session     SparkSession factory (AQE on, UTC, tuned shuffle partitions)
    io          parquet table catalog over the driver testdata layout
    operators/  relational operators (joins, aggregates, windows, sorts, ...)
    functions/  scalar/text/similarity function libraries
    sources/    streaming + batch sources (framed-Avro Kafka model, files)
    streaming/  event-time / watermark / stateful streaming operators
    plans/      the query registry binding operators to the driver contract
"""

__version__ = "0.1.0"
