from economic_data_etl_spark.operators.asof import asof_join
from economic_data_etl_spark.operators.sessionize import sessionize
from economic_data_etl_spark.operators.topk import grouped_top_k

__all__ = ["asof_join", "sessionize", "grouped_top_k"]
