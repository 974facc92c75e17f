from faisssearcher_spark.functions import metrics, vector, text

__all__ = ["metrics", "vector", "text"]
