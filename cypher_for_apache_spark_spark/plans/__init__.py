from cypher_for_apache_spark_spark.plans.record import Record
from cypher_for_apache_spark_spark.plans.planner import Planner

__all__ = ["Record", "Planner"]
