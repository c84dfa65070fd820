from bigdata_lab4_spark.ml.tfidf import SklearnTfidf, SklearnTfidfModel
from bigdata_lab4_spark.ml.pipeline import SentimentPipeline, SentimentModel

__all__ = [
    "SklearnTfidf",
    "SklearnTfidfModel",
    "SentimentPipeline",
    "SentimentModel",
]
