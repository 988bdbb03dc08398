"""Function name registry: aggregates vs scalar functions.

Aggregator inventory mirrors the reference (Expr.scala:1045-1155, Spark
mapping SparkSQLExprMapper.scala:427-470 — SURVEY.md §2.5). Names are
matched lower-cased (Cypher function names are case-insensitive).
"""

AGGREGATES = {
    "count",
    "sum",
    "avg",
    "min",
    "max",
    "collect",
    "stdev",
    "stdevp",
    "percentilecont",
    "percentiledisc",
}

# Scalar functions the compiler understands; used for error messages and
# SURVEY §2.4 coverage accounting. The actual dispatch lives in compiler.py.
SCALARS = {
    # element functions
    "id", "labels", "type", "keys", "properties", "startnode", "endnode",
    "exists",
    # casts
    "tointeger", "tofloat", "tostring", "toboolean", "bigdecimal",
    # strings
    "trim", "ltrim", "rtrim", "toupper", "tolower", "reverse", "replace",
    "substring", "split", "left", "right",
    # lists
    "size", "length", "head", "last", "tail", "range",
    # math
    "abs", "ceil", "floor", "round", "sign", "sqrt", "exp", "log", "log10",
    "e", "pi", "rand",
    # trig
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2", "cot", "degrees",
    "radians", "haversin",
    # conditionals
    "coalesce",
    # temporal
    "date", "localdatetime", "duration", "timestamp",
}
