Feature: UnwindCasePagination

  Scenario: UNWIND of null produces no rows
    Given an empty graph
    When executing query:
      """
      UNWIND null AS x RETURN x
      """
    Then the result should be empty
    And no side effects

  Scenario: UNWIND of an empty list produces no rows
    Given an empty graph
    When executing query:
      """
      UNWIND [] AS x RETURN x
      """
    Then the result should be empty
    And no side effects

  Scenario: UNWIND keeps null elements
    Given an empty graph
    When executing query:
      """
      UNWIND [1, null, 2] AS x RETURN x
      """
    Then the result should be, in any order:
      | x    |
      | 1    |
      | null |
      | 2    |
    And no side effects

  Scenario: Double UNWIND is a cartesian product
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2] AS x UNWIND ['a', 'b'] AS y RETURN x, y
      """
    Then the result should be, in any order:
      | x | y   |
      | 1 | 'a' |
      | 1 | 'b' |
      | 2 | 'a' |
      | 2 | 'b' |
    And no side effects

  Scenario: UNWIND a nested list one level
    Given an empty graph
    When executing query:
      """
      UNWIND [[1, 2], [3]] AS l RETURN size(l) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
      | 1 |
    And no side effects

  Scenario: Searched CASE without ELSE yields null
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 5] AS x RETURN x, CASE WHEN x > 3 THEN 'big' END AS label
      """
    Then the result should be, in any order:
      | x | label |
      | 1 | null  |
      | 5 | 'big' |
    And no side effects

  Scenario: Simple CASE with null subject falls to ELSE
    Given an empty graph
    When executing query:
      """
      WITH null AS x RETURN CASE x WHEN null THEN 'matched' ELSE 'else' END AS r
      """
    Then the result should be, in any order:
      | r      |
      | 'else' |
    And no side effects

  Scenario: LIMIT 0 returns nothing
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v LIMIT 0
      """
    Then the result should be empty
    And no side effects

  Scenario: SKIP past the end returns nothing
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v AS v ORDER BY v SKIP 5
      """
    Then the result should be empty
    And no side effects

  Scenario: ORDER BY on a WITH alias then filter
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 3}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.v * 10 AS w ORDER BY w DESC LIMIT 2 RETURN w
      """
    Then the result should be, in order:
      | w  |
      | 30 |
      | 20 |
    And no side effects
