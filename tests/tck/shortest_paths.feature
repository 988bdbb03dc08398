Feature: ShortestPaths

  # Bounded shortestPath / allShortestPaths (planner._plan_shortest_path):
  # frontier-pruned BFS with Neo4j semantics — trail uniqueness, 'single'
  # picks the lexicographically least rel-id list. Minimum length >= 2
  # (which Neo4j itself rejects) finds the shortest trail of length >= lo
  # per pair (planner._minlen_shortest_levels, round 8).
  # Beyond reference parity: the reference's TCK blacklist fails the
  # whole ShortestPath family. The path value of a var-length path has no
  # static element list, so p binds the traversed rel-id list: length(p)
  # works, nodes(p) stays unsupported (as for plain var-length).

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:X {name: 'a'})-[:E]->(b:X {name: 'b'})-[:E]->(d:X {name: 'd'}),
             (a)-[:E]->(c:X {name: 'c'})-[:E]->(d),
             (a)-[:E]->(e:X {name: 'e'})-[:E]->(f:X {name: 'f'})-[:E]->(d),
             (d)-[:E]->(g:X {name: 'g'}),
             (:X {name: 'z'})
      """

  Scenario: Single shortest path returns one row at minimum length
    When executing query:
      """
      MATCH p = shortestPath((a:X {name: 'a'})-[:E*1..4]->(d:X {name: 'd'}))
      RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 2 |
    And no side effects

  Scenario: All shortest paths returns every minimum-length path
    When executing query:
      """
      MATCH p = allShortestPaths((a:X {name: 'a'})-[:E*1..4]->(d:X {name: 'd'}))
      RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 2 |
      | 2 |
    And no side effects

  Scenario: Shortest-path multiplicity propagates through later hops
    When executing query:
      """
      MATCH p = allShortestPaths((a:X {name: 'a'})-[:E*1..4]->(g:X {name: 'g'}))
      RETURN length(p) AS l, count(*) AS c
      """
    Then the result should be, in any order:
      | l | c |
      | 3 | 2 |
    And no side effects

  Scenario: Endpoint pairs with no path inside the bound are filtered
    When executing query:
      """
      MATCH p = shortestPath((a:X {name: 'a'})-[:E*1..2]->(g:X {name: 'g'}))
      RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
    And no side effects

  Scenario: Zero-length shortest path binds the source itself
    When executing query:
      """
      MATCH p = shortestPath((f:X {name: 'f'})-[:E*0..2]->(b))
      RETURN b.name AS b, length(p) AS l
      """
    Then the result should be, in any order:
      | b   | l |
      | 'f' | 0 |
      | 'd' | 1 |
      | 'g' | 2 |
    And no side effects

  Scenario: Undirected shortest path explores both orientations
    When executing query:
      """
      MATCH p = shortestPath((b:X {name: 'b'})-[:E*1..4]-(c:X {name: 'c'}))
      RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 2 |
    And no side effects

  Scenario: Undirected all-shortest finds paths through both shared neighbours
    When executing query:
      """
      MATCH p = allShortestPaths((b:X {name: 'b'})-[:E*1..4]-(c:X {name: 'c'}))
      RETURN length(p) AS l, count(*) AS c
      """
    Then the result should be, in any order:
      | l | c |
      | 2 | 2 |
    And no side effects

  Scenario: An undirected step cannot reuse the edge it arrived on
    When executing query:
      """
      MATCH p = shortestPath((g:X {name: 'g'})-[:E*1..2]-(g2:X {name: 'g'}))
      WHERE id(g) = id(g2)
      RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
    And no side effects

  Scenario: Shortest path against a bound target variable
    When executing query:
      """
      MATCH (d:X) WHERE d.name IN ['d', 'f']
      MATCH p = shortestPath((a:X {name: 'a'})-[:E*1..4]->(d))
      RETURN d.name AS d, length(p) AS l
      """
    Then the result should be, in any order:
      | d   | l |
      | 'd' | 2 |
      | 'f' | 2 |
    And no side effects

  Scenario: OPTIONAL MATCH shortestPath yields null on no match
    When executing query:
      """
      MATCH (z:X {name: 'z'})
      OPTIONAL MATCH p = shortestPath((z)-[:E*1..3]->(t:X))
      RETURN z.name AS z, length(p) AS l
      """
    Then the result should be, in any order:
      | z   | l    |
      | 'z' | null |
    And no side effects

  Scenario: The relationship variable binds the traversed id list
    When executing query:
      """
      MATCH shortestPath((a:X {name: 'a'})-[r:E*1..4]->(d:X {name: 'd'}))
      RETURN size(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And no side effects

  Scenario: shortestPath in a WHERE-filtered aggregate
    When executing query:
      """
      MATCH p = shortestPath((a:X {name: 'a'})-[:E*1..4]->(t:X))
      WHERE t.name <> 'a'
      RETURN length(p) AS l, count(*) AS c
      """
    Then the result should be, in any order:
      | l | c |
      | 1 | 3 |
      | 2 | 2 |
      | 3 | 1 |
    And no side effects

  Scenario: Unbounded shortestPath walks to the fixpoint
    # supported since round 7: driver-paced BFS rounds until the pruned
    # frontier drains (at most diameter+1 rounds)
    When executing query:
      """
      MATCH p = shortestPath((a:X {name: 'a'})-[:E*]->(d:X {name: 'd'}))
      RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 2 |
    And no side effects

  Scenario: Unbounded allShortestPaths finds every minimal path
    When executing query:
      """
      MATCH p = allShortestPaths((a:X {name: 'a'})-[:E*]->(d:X {name: 'd'}))
      RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 2 |
      | 2 |
    And no side effects

  Scenario: Unbounded shortestPath with zero minimum includes the start
    When executing query:
      """
      MATCH p = shortestPath((a:X {name: 'a'})-[:E*0..]->(x))
      WHERE x.name IN ['a', 'd']
      RETURN x.name AS n, length(p) AS l
      """
    Then the result should be, in any order:
      | n   | l |
      | 'a' | 0 |
      | 'd' | 2 |
    And no side effects

  Scenario: Minimum length two skips a direct neighbor
    When executing query:
      """
      MATCH p = shortestPath((a:X {name: 'a'})-[:E*2..4]->(g:X {name: 'g'}))
      RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 3 |
    And no side effects

  Scenario: Minimum length above the plain shortest distance detours
    When executing query:
      """
      MATCH p = shortestPath((a:X {name: 'a'})-[:E*3..]->(d:X {name: 'd'}))
      RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 3 |
    And no side effects

  Scenario: allShortestPaths with a minimum keeps every minimal valid trail
    When executing query:
      """
      MATCH p = allShortestPaths((a:X {name: 'a'})-[:E*3..]->(d:X {name: 'd'}))
      RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 3 |
    And no side effects

  Scenario: Minimum length with no valid trail yields no rows
    When executing query:
      """
      MATCH p = shortestPath((a:X {name: 'a'})-[:E*3..4]->(b:X {name: 'b'}))
      RETURN length(p) AS l
      """
    Then the result should be empty

  Scenario: Undirected minimum length cannot reuse the only edge
    Given an empty graph
    And having executed:
      """
      CREATE (:Y {name: 'u'})-[:E]->(:Y {name: 'v'})
      """
    When executing query:
      """
      MATCH p = shortestPath((u:Y {name: 'u'})-[:E*2..]-(v:Y {name: 'v'}))
      RETURN length(p) AS l
      """
    Then the result should be empty

  Scenario: Minimum above maximum yields no rows
    When executing query:
      """
      MATCH p = shortestPath((a:X {name: 'a'})-[:E*3..2]->(d:X {name: 'd'}))
      RETURN length(p) AS l
      """
    Then the result should be empty

  Scenario: shortestPath over a fixed-length pattern is rejected
    When executing query:
      """
      MATCH p = shortestPath((a)-[:E]->(b)) RETURN length(p)
      """
    Then a SyntaxError should be raised

  Scenario: shortestPath over a multi-hop pattern is rejected
    When executing query:
      """
      MATCH p = shortestPath((a)-[:E*1..2]->()-[:E*1..2]->(b)) RETURN length(p)
      """
    Then a SyntaxError should be raised
