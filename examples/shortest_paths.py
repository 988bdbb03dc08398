"""Bounded shortestPath / allShortestPaths over an in-memory flight graph.

Beyond reference parity (the reference's TCK blacklist fails the whole
ShortestPath family): frontier-pruned BFS with Neo4j semantics — see
planner._plan_shortest_path. Demonstrates single vs all modes, undirected
search, zero-length bounds, and the rel-id-list path binding.
"""

from __future__ import annotations

from examples._common import main


def run(spark) -> None:
    from cypher_for_apache_spark_spark import CypherSession

    session = CypherSession(spark)
    airports = spark.createDataFrame(
        [(0, "SFO"), (1, "DEN"), (2, "ORD"), (3, "JFK"), (4, "LHR"), (5, "NRT")],
        "id long, code string",
    )
    flights = spark.createDataFrame(
        [
            (10, 0, 1, 120),  # SFO -> DEN
            (11, 1, 2, 110),  # DEN -> ORD
            (12, 2, 3, 95),   # ORD -> JFK
            (13, 0, 2, 240),  # SFO -> ORD (direct)
            (14, 3, 4, 400),  # JFK -> LHR
            (15, 0, 5, 600),  # SFO -> NRT
            (16, 5, 4, 700),  # NRT -> LHR
        ],
        "id long, src long, dst long, minutes long",
    )
    g = session.read_from(
        nodes={"Airport": airports}, relationships={"FLIGHT": flights}
    )

    print("== fewest hops SFO -> LHR (single shortest path)")
    g.cypher(
        """MATCH p = shortestPath((a:Airport {code: 'SFO'})-[:FLIGHT*1..4]->(b:Airport {code: 'LHR'}))
           RETURN length(p) AS hops"""
    ).show()

    print("== every minimum-hop routing SFO -> JFK (all shortest paths)")
    g.cypher(
        """MATCH p = allShortestPaths((a:Airport {code: 'SFO'})-[r:FLIGHT*1..4]->(b:Airport {code: 'JFK'}))
           RETURN size(r) AS hops, r AS flight_ids"""
    ).show(truncate=False)

    print("== hop distance from ORD to every reachable airport (zero included)")
    g.cypher(
        """MATCH p = shortestPath((a:Airport {code: 'ORD'})-[:FLIGHT*0..4]->(b))
           RETURN b.code AS airport, length(p) AS hops
           ORDER BY hops, airport"""
    ).show()

    print("== undirected: airports within 2 undirected hops of DEN")
    g.cypher(
        """MATCH shortestPath((a:Airport {code: 'DEN'})-[r:FLIGHT*1..2]-(b))
           RETURN b.code AS airport, size(r) AS hops
           ORDER BY hops, airport"""
    ).show()


if __name__ == "__main__":
    main(run)
