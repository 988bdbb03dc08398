Feature: OrderBy2

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {name: 'a', x: 3, y: 1}),
             (:N {name: 'b', x: 1, y: 2}),
             (:N {name: 'c', x: 3, y: 0}),
             (:N {name: 'd', x: 2})
      """

  Scenario: Order by two keys with mixed directions
    When executing query:
      """
      MATCH (n:N) RETURN n.name AS name
      ORDER BY n.x DESC, n.y ASC
      """
    Then the result should be, in order:
      | name |
      | 'c'  |
      | 'a'  |
      | 'd'  |
      | 'b'  |
    And no side effects

  Scenario: Null orders last ascending
    When executing query:
      """
      MATCH (n:N) RETURN n.name AS name ORDER BY n.y
      """
    Then the result should be, in order:
      | name |
      | 'c'  |
      | 'a'  |
      | 'b'  |
      | 'd'  |
    And no side effects

  Scenario: Null orders first descending
    When executing query:
      """
      MATCH (n:N) RETURN n.name AS name ORDER BY n.y DESC
      """
    Then the result should be, in order:
      | name |
      | 'd'  |
      | 'b'  |
      | 'a'  |
      | 'c'  |
    And no side effects

  Scenario: Order by an expression
    When executing query:
      """
      MATCH (n:N) WHERE n.y IS NOT NULL
      RETURN n.name AS name ORDER BY n.x * 10 + n.y
      """
    Then the result should be, in order:
      | name |
      | 'b'  |
      | 'c'  |
      | 'a'  |
    And no side effects

  Scenario: Order by a column not in the projection
    When executing query:
      """
      MATCH (n:N) RETURN n.name AS name ORDER BY n.x, n.name
      """
    Then the result should be, in order:
      | name |
      | 'b'  |
      | 'd'  |
      | 'a'  |
      | 'c'  |
    And no side effects

  Scenario: Limit zero returns nothing
    When executing query:
      """
      MATCH (n:N) RETURN n.name AS name LIMIT 0
      """
    Then the result should be empty
    And no side effects

  Scenario: Skip everything returns nothing
    When executing query:
      """
      MATCH (n:N) RETURN n.name AS name ORDER BY n.name SKIP 10
      """
    Then the result should be empty
    And no side effects

  Scenario: Skip and limit windows the middle
    When executing query:
      """
      MATCH (n:N) RETURN n.name AS name ORDER BY n.name SKIP 1 LIMIT 2
      """
    Then the result should be, in order:
      | name |
      | 'b'  |
      | 'c'  |
    And no side effects

  Scenario: Order strings lexicographically
    When executing query:
      """
      UNWIND ['pear', 'apple', 'fig'] AS f RETURN f ORDER BY f
      """
    Then the result should be, in order:
      | f       |
      | 'apple' |
      | 'fig'   |
      | 'pear'  |
    And no side effects

  Scenario: Order after WITH aggregation
    When executing query:
      """
      MATCH (n:N) WITH n.x AS x, count(*) AS c
      RETURN x, c ORDER BY c DESC, x
      """
    Then the result should be, in order:
      | x | c |
      | 3 | 2 |
      | 1 | 1 |
      | 2 | 1 |
    And no side effects
