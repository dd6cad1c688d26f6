from market_data_pipeline_spark.sources.catalog import Catalog, load_table

__all__ = ["Catalog", "load_table"]
