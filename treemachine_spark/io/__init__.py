from treemachine_spark.io.tables import TABLE_NAMES, load_tables

__all__ = ["TABLE_NAMES", "load_tables"]
