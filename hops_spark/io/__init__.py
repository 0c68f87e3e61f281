from hops_spark.io.readers import load_table, load_tables, TABLES  # noqa: F401
