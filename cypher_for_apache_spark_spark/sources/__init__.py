"""Property-graph data sources: filesystem layouts (parquet/csv/orc/json),
edge lists, relational-table mappings (reference PGDS SPI surface:
okapi-api/.../api/io/PropertyGraphDataSource.scala, SURVEY.md §2.7)."""
