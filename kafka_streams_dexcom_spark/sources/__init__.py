"""Sources: parquet test tables, Kafka stream/table sources, REST ingestion."""

from kafka_streams_dexcom_spark.sources.files import load_table, load_tables  # noqa: F401
