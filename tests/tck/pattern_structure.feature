Feature: PatternStructure

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a'})-[:T {k: 1}]->(b:N {name: 'b'}),
             (b)-[:T {k: 2}]->(a),
             (c:N {name: 'c'})-[:T {k: 3}]->(c)
      """

  Scenario: Relationship uniqueness within one MATCH
    When executing query:
      """
      MATCH (x)-[r1:T]->(y)<-[r2:T]-(x)
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |
    And no side effects

  Scenario: Two distinct relationships may close a cycle
    When executing query:
      """
      MATCH (x)-[r1:T]->(y)-[r2:T]->(x)
      WHERE x.name = 'a'
      RETURN r1.k AS k1, r2.k AS k2
      """
    Then the result should be, in any order:
      | k1 | k2 |
      | 1  | 2  |
    And no side effects

  Scenario: Repeated node variable matches self-loops only
    When executing query:
      """
      MATCH (x)-[r:T]->(x) RETURN x.name AS name, r.k AS k
      """
    Then the result should be, in any order:
      | name | k |
      | 'c'  | 3 |
    And no side effects

  Scenario: UNWIND then collect round-trips the list
    When executing query:
      """
      WITH [3, 1, 2] AS l UNWIND l AS x
      WITH x ORDER BY x
      RETURN collect(x) AS sorted
      """
    Then the result should be, in any order:
      | sorted    |
      | [1, 2, 3] |
    And no side effects

  Scenario: OPTIONAL MATCH from a bound node leaves nulls
    When executing query:
      """
      MATCH (x:N) WHERE x.name = 'c'
      OPTIONAL MATCH (x)-[r:T]->(other) WHERE other <> x
      RETURN x.name AS name, r.k AS k
      """
    Then the result should be, in any order:
      | name | k    |
      | 'c'  | null |
    And no side effects

  Scenario: count of a nullable expression skips OPTIONAL nulls
    When executing query:
      """
      MATCH (x:N)
      OPTIONAL MATCH (x)-[r:T]->(y) WHERE y <> x
      RETURN count(*) AS rows, count(r) AS rels
      """
    Then the result should be, in any order:
      | rows | rels |
      | 3    | 2    |
    And no side effects

  Scenario: DISTINCT on full nodes deduplicates by identity
    When executing query:
      """
      MATCH (x:N)-[:T]->()
      RETURN count(DISTINCT x) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |
    And no side effects

  Scenario: ORDER BY an expression not in the projection
    When executing query:
      """
      MATCH ()-[r:T]->() RETURN r.k * 10 AS tens ORDER BY r.k DESC
      """
    Then the result should be, in order:
      | tens |
      | 30   |
      | 20   |
      | 10   |
    And no side effects
