Feature: ProjectionStarParams

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:V {k: 1}), (:V {k: 2}), (:V {k: 3}), (:V {k: 4})
      """

  Scenario: RETURN star projects all bound variables
    When executing query:
      """
      MATCH (v:V) WHERE v.k <= 2 WITH v.k AS k, v.k * 10 AS tens
      RETURN * ORDER BY k
      """
    Then the result should be, in order:
      | k | tens |
      | 1 | 10   |
      | 2 | 20   |
    And no side effects

  Scenario: WITH star keeps scope and adds an alias
    When executing query:
      """
      MATCH (v:V) WITH v.k AS k
      WITH *, k * k AS sq
      RETURN k, sq ORDER BY k LIMIT 2
      """
    Then the result should be, in order:
      | k | sq |
      | 1 | 1  |
      | 2 | 4  |
    And no side effects

  Scenario: SKIP and LIMIT from parameters
    And parameters are:
      | s | 1 |
      | l | 2 |
    When executing query:
      """
      MATCH (v:V) RETURN v.k AS k ORDER BY k SKIP $s LIMIT $l
      """
    Then the result should be, in order:
      | k |
      | 2 |
      | 3 |
    And no side effects

  Scenario: DISTINCT then ORDER BY on the deduplicated rows
    When executing query:
      """
      UNWIND [3, 1, 3, 2, 1] AS x
      RETURN DISTINCT x ORDER BY x DESC
      """
    Then the result should be, in order:
      | x |
      | 3 |
      | 2 |
      | 1 |
    And no side effects

  Scenario: Parameter inside an expression predicate
    And parameters are:
      | lo | 2 |
    When executing query:
      """
      MATCH (v:V) WHERE v.k >= $lo + 1 RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And no side effects
