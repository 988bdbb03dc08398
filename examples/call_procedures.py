"""CALL ... YIELD procedures: run the distributed algorithm library from
inside the query language (the Neo4j/GDS idiom), plus zoned datetimes.
Beyond reference parity: the reference has neither procedures
(cypher-cypher9-features.adoc:57-76) nor zoned temporal types (:32-54).
"""

from __future__ import annotations

from cypher_for_apache_spark_spark import CypherSession


def run(spark) -> None:
    session = CypherSession(spark)
    pages = spark.createDataFrame(
        [(0, "home"), (1, "docs"), (2, "blog"), (3, "island")],
        "id long, name string",
    )
    links = spark.createDataFrame(
        [(0, 0, 1), (1, 1, 2), (2, 2, 0), (3, 1, 0)],
        "id long, src long, dst long",
    )
    g = session.read_from(nodes={"Page": pages}, relationships={"LINKS": links})

    # procedure output joins back into the pattern: the cross join +
    # id(n) = id filter collapses to an equi-join inside Catalyst
    top = session.cypher(
        """CALL algo.pageRank(10, 0.85) YIELD id, rank
           MATCH (n:Page) WHERE id(n) = id
           RETURN n.name AS name, round(rank, 4) AS rank
           ORDER BY rank DESC, name LIMIT 3""",
        graph=g,
    ).to_maps()
    assert len(top) == 3 and top[0]["rank"] >= top[-1]["rank"]
    assert "island" not in {r["name"] for r in top}

    parts = session.cypher(
        """CALL algo.connectedComponents() YIELD id, component
           RETURN count(DISTINCT component) AS parts""",
        graph=g,
    ).to_maps()
    assert parts == [{"parts": 2}]

    # schema procedures, standalone form
    labels = session.cypher("CALL db.labels()", graph=g).to_maps()
    assert labels == [{"label": "Page"}]

    # user-registered procedure
    def fibs(ctx, n):
        vals, a, b = [], 0, 1
        for _ in range(int(n)):
            vals.append((a,))
            a, b = b, a + b
        return ctx.spark.createDataFrame(vals, "fib long")

    session.register_procedure("my.fibs", fibs, ["fib"])
    out = session.cypher(
        "CALL my.fibs(5) YIELD fib RETURN collect(fib) AS l", graph=g
    ).to_maps()
    assert out == [{"l": [0, 1, 1, 2, 3]}]

    # zoned datetimes: calendar arithmetic is DST-aware in the value's zone
    dst = session.cypher(
        """WITH datetime('2024-03-30T12:00:00[Europe/Paris]') AS dt
           RETURN (dt + duration('P1D')).hour AS wall_hour,
                  (dt + duration('P1D')).epochSeconds - dt.epochSeconds
                    AS real_seconds""",
        graph=g,
    ).to_maps()
    assert dst == [{"wall_hour": 12, "real_seconds": 82800}]  # 23 real hours


if __name__ == "__main__":
    from _common import main

    main(run)
