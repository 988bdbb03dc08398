from cypher_for_apache_spark_spark.functions.registry import AGGREGATES
from cypher_for_apache_spark_spark.functions.compiler import CompileCtx, compile_expr

__all__ = ["AGGREGATES", "CompileCtx", "compile_expr"]
