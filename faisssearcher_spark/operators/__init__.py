from faisssearcher_spark.operators.knn import knn_join, cal_sim
from faisssearcher_spark.operators import (balance, bitext, bloom, bm25,
                                           bpe,
                                           classifier, conversations,
                                           curate,
                                           decontam, dedup, diffing, evaluation, expect, graph,
                                           incremental, layout, maxsim,
                                           privacy, projection,
                                           sampling, sketches,
                                           temporal,
                                           text_analysis, unigram,
                                           wordpiece)

__all__ = ["knn_join", "cal_sim", "balance", "bitext", "bloom", "bm25", "bpe", "classifier", "conversations", "curate",
           "decontam", "dedup", "diffing", "evaluation", "expect", "graph", "incremental", "layout", "maxsim", "privacy", "projection", "sampling", "sketches", "temporal",
           "text_analysis", "unigram", "wordpiece"]
