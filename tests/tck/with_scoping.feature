Feature: WithScoping

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:E {k: 'x', v: 1}), (:E {k: 'x', v: 2}), (:E {k: 'y', v: 5})
      """

  Scenario: WITH narrows the variable scope
    When executing query:
      """
      MATCH (e:E) WITH e.v AS v MATCH (f:E {v: v}) RETURN f.k AS k, v
      """
    Then the result should be, in any order:
      | k   | v |
      | 'x' | 1 |
      | 'x' | 2 |
      | 'y' | 5 |
    And no side effects

  Scenario: WITH DISTINCT deduplicates before the next clause
    When executing query:
      """
      MATCH (e:E) WITH DISTINCT e.k AS k RETURN k ORDER BY k
      """
    Then the result should be, in order:
      | k   |
      | 'x' |
      | 'y' |
    And no side effects

  Scenario: ORDER BY an aggregate alias from WITH
    When executing query:
      """
      MATCH (e:E) WITH e.k AS k, sum(e.v) AS total
      RETURN k, total ORDER BY total DESC
      """
    Then the result should be, in order:
      | k   | total |
      | 'y' | 5     |
      | 'x' | 3     |
    And no side effects

  Scenario: WITH LIMIT then aggregate
    When executing query:
      """
      MATCH (e:E) WITH e ORDER BY e.v LIMIT 2
      RETURN count(*) AS n, sum(e.v) AS total
      """
    Then the result should be, in any order:
      | n | total |
      | 2 | 3     |
    And no side effects

  Scenario: Aliasing an expression of a prior alias
    When executing query:
      """
      MATCH (e:E) WITH e.v AS v WITH v * 10 AS v10 RETURN v10 ORDER BY v10
      """
    Then the result should be, in order:
      | v10 |
      | 10  |
      | 20  |
      | 50  |
    And no side effects

  Scenario: UNION requires identical column names
    When executing query:
      """
      MATCH (e:E {k: 'x'}) RETURN e.v AS v
      UNION
      MATCH (e:E {k: 'y'}) RETURN e.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
      | 5 |
    And no side effects
