"""Record = DataFrame + header (variable -> physical columns).

The engine-side analogue of the reference's operator output contract: every
physical operator computes its output header alongside its output table
(RelationalOperator.scala:68-123). Here both travel together in one value.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame

from cypher_for_apache_spark_spark.header import Header


@dataclass
class Record:
    df: Optional[DataFrame]  # None = unit table (one implicit row, no columns)
    header: Header = field(default_factory=dict)

    def bound(self):
        return set(self.header)

    def meta(self, var: str):
        return self.header.get(var)
