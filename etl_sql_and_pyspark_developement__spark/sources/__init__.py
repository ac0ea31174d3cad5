from etl_sql_and_pyspark_developement__spark.sources.catalog import (
    TABLES,
    load_all,
    register_views,
    table,
)

__all__ = ["TABLES", "table", "load_all", "register_views"]
