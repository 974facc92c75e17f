from faisssearcher_spark.operators.knn import knn_join, cal_sim

__all__ = ["knn_join", "cal_sim"]
