Feature: SemanticsGaps

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:G {name: 'a', v: 1})-[:R {w: 10}]->(b:G {name: 'b', v: 2}),
             (b)-[:R {w: 20}]->(c:G:H {name: 'c'})
      """

  Scenario: Simple CASE with null subject falls through to ELSE
    When executing query:
      """
      MATCH (n:G) WHERE n.name = 'c'
      RETURN CASE n.v WHEN null THEN 'eq-null' WHEN 1 THEN 'one' ELSE 'other' END AS r
      """
    Then the result should be, in any order:
      | r       |
      | 'other' |
    And no side effects

  Scenario: Searched CASE without ELSE yields null
    When executing query:
      """
      MATCH (n:G) WHERE n.name = 'a'
      RETURN CASE WHEN n.v > 5 THEN 'big' END AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: startNode and endNode of a matched relationship
    When executing query:
      """
      MATCH ()-[r:R {w: 10}]->()
      RETURN startNode(r).name AS s, endNode(r).name AS e
      """
    Then the result should be, in any order:
      | s   | e   |
      | 'a' | 'b' |
    And no side effects

  Scenario: Chained comparison is a conjunction
    When executing query:
      """
      UNWIND [1, 2, 3] AS x
      WITH x WHERE 1 < x < 3
      RETURN x
      """
    Then the result should be, in any order:
      | x |
      | 2 |
    And no side effects

  Scenario: Chained comparison with null operand filters the row
    When executing query:
      """
      MATCH (n:G) WHERE n.name = 'c'
      WITH n WHERE 0 < n.v < 10
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
    And no side effects

  Scenario: Label predicate in WHERE
    When executing query:
      """
      MATCH (n:G) WHERE n:H RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'c'  |
    And no side effects

  Scenario: type of a relationship
    When executing query:
      """
      MATCH ()-[r]->() RETURN DISTINCT type(r) AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'R' |
    And no side effects

  Scenario: keys of a node and of a map
    When executing query:
      """
      MATCH (n:G) WHERE n.name = 'a'
      RETURN size(keys(n)) AS nk, keys({x: 1, y: null}) AS mk
      """
    Then the result should be, in any order:
      | nk | mk         |
      | 2  | ['x', 'y'] |
    And no side effects

  Scenario: Nested UNWIND produces the cross product
    When executing query:
      """
      UNWIND [1, 2] AS x
      UNWIND ['p', 'q'] AS y
      RETURN x, y
      """
    Then the result should be, in any order:
      | x | y   |
      | 1 | 'p' |
      | 1 | 'q' |
      | 2 | 'p' |
      | 2 | 'q' |
    And no side effects

  Scenario: List concatenation with plus
    When executing query:
      """
      RETURN [1, 2] + [3] AS l, [] + [1] AS e
      """
    Then the result should be, in any order:
      | l         | e   |
      | [1, 2, 3] | [1] |
    And no side effects

  Scenario: count DISTINCT skips nulls
    When executing query:
      """
      MATCH (n) RETURN count(DISTINCT n.v) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |
    And no side effects

  Scenario: properties() of a node equals the map literal
    When executing query:
      """
      MATCH (n:G) WHERE n.name = 'a'
      RETURN properties(n) = {name: 'a', v: 1} AS eq
      """
    Then the result should be, in any order:
      | eq   |
      | true |
    And no side effects

  Scenario: Exponentiation returns a float
    When executing query:
      """
      RETURN 2 ^ 3 AS p, 9 ^ 0.5 AS r
      """
    Then the result should be, in any order:
      | p   | r   |
      | 8.0 | 3.0 |
    And no side effects

  Scenario: Modulo follows the dividend sign
    When executing query:
      """
      RETURN 7 % 3 AS a, -7 % 3 AS b, 7 % -3 AS c
      """
    Then the result should be, in any order:
      | a | b  | c |
      | 1 | -1 | 1 |
    And no side effects

  Scenario: coalesce returns the first non-null argument
    When executing query:
      """
      MATCH (n:G) WHERE n.name = 'c'
      RETURN coalesce(n.v, n.missing, 42) AS r
      """
    Then the result should be, in any order:
      | r  |
      | 42 |
    And no side effects
