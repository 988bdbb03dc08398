Feature: GraphEdgeCases

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:X {name: 'a'})-[:R {w: 1}]->(a),
             (b:X {name: 'b'})-[:R {w: 2}]->(c:X {name: 'c'})
      """

  Scenario: Self-loop matches a repeated node variable
    When executing query:
      """
      MATCH (x)-[r:R]->(x) RETURN x.name AS name, r.w AS w
      """
    Then the result should be, in any order:
      | name | w |
      | 'a'  | 1 |
    And no side effects

  Scenario: startNode and endNode identify relationship endpoints
    When executing query:
      """
      MATCH (s)-[r:R {w: 2}]->(e)
      RETURN startNode(r) = id(s) AS sm, endNode(r) = id(e) AS em,
             s.name AS sn, e.name AS en
      """
    Then the result should be, in any order:
      | sm   | em   | sn  | en  |
      | true | true | 'b' | 'c' |
    And no side effects

  Scenario: Undirected match returns both orientations but self-loops once
    When executing query:
      """
      MATCH (x)-[r:R]-(y) RETURN x.name AS xn, y.name AS yn
      """
    Then the result should be, in any order:
      | xn  | yn  |
      | 'a' | 'a' |
      | 'b' | 'c' |
      | 'c' | 'b' |
    And no side effects

  Scenario: Reversed arrow swaps roles
    When executing query:
      """
      MATCH (x)<-[r:R {w: 2}]-(y) RETURN x.name AS xn, y.name AS yn
      """
    Then the result should be, in any order:
      | xn  | yn  |
      | 'c' | 'b' |
    And no side effects

  Scenario: type over all relationships
    When executing query:
      """
      MATCH ()-[r]->() RETURN DISTINCT type(r) AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'R' |
    And no side effects

  Scenario: id values are distinct per element
    When executing query:
      """
      MATCH (n) WITH collect(DISTINCT id(n)) AS ids
      RETURN size(ids) AS n_ids
      """
    Then the result should be, in any order:
      | n_ids |
      | 3     |
    And no side effects
