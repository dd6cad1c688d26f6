from market_data_pipeline_spark.storage.table import ParquetTable

__all__ = ["ParquetTable"]
