"""CALL { } subqueries: per-row aggregates, row multiplication, and
top-k-per-node pagination — all set-based (distinct import binding +
join-back; pagination is one row_number window, never a per-row loop).
Beyond reference parity: the reference has no subquery support.
"""

from __future__ import annotations

from examples._common import main


def run(spark) -> None:
    from cypher_for_apache_spark_spark import CypherSession

    session = CypherSession(spark)
    people = spark.createDataFrame(
        [(0, "ann", 41), (1, "bob", 27), (2, "cat", 35), (3, "dan", 19)],
        "id long, name string, age long",
    )
    follows = spark.createDataFrame(
        [(10, 0, 1), (11, 0, 2), (12, 0, 3), (13, 1, 2), (14, 2, 3)],
        "id long, src long, dst long",
    )
    g = session.read_from(
        nodes={"Person": people}, relationships={"FOLLOWS": follows}
    )

    print("== per-person follow count (zero-match rows kept at 0)")
    g.cypher(
        """MATCH (p:Person)
           CALL { WITH p MATCH (p)-[:FOLLOWS]->(q) RETURN count(q) AS follows }
           RETURN p.name AS person, follows ORDER BY follows DESC, person"""
    ).show()

    print("== top-2 youngest follows per person (per-row ORDER BY + LIMIT)")
    g.cypher(
        """MATCH (p:Person)
           CALL { WITH p MATCH (p)-[:FOLLOWS]->(q)
                  RETURN q.name AS follow ORDER BY q.age ASC LIMIT 2 }
           RETURN p.name AS person, follow ORDER BY person, follow"""
    ).show()

    print("== COUNT {} sugar in a predicate")
    g.cypher(
        """MATCH (p:Person)
           WHERE COUNT { (p)-[:FOLLOWS]->() } >= 2
           RETURN p.name AS person ORDER BY person"""
    ).show()


if __name__ == "__main__":
    main(run)
