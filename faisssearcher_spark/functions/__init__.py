from faisssearcher_spark.functions import metrics, sqlapi, vector, text
from faisssearcher_spark.functions.sqlapi import register_sql_functions

__all__ = ["metrics", "sqlapi", "vector", "text",
           "register_sql_functions"]
