Feature: ReturnAggregation

  Scenario: Count star groups by the non-aggregated column
    Given an empty graph
    And having executed:
      """
      CREATE (:Animal {kind: 'cat'}), (:Animal {kind: 'cat'}), (:Animal {kind: 'dog'})
      """
    When executing query:
      """
      MATCH (a:Animal) RETURN a.kind AS kind, count(*) AS n
      """
    Then the result should be, in any order:
      | kind  | n |
      | 'cat' | 2 |
      | 'dog' | 1 |
    And no side effects

  Scenario: Aggregates skip nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:X {v: 1}), (:X {v: 3}), (:X)
      """
    When executing query:
      """
      MATCH (x:X) RETURN count(x.v) AS c, sum(x.v) AS s, avg(x.v) AS a
      """
    Then the result should be, in any order:
      | c | s | a   |
      | 2 | 4 | 2.0 |
    And no side effects

  Scenario: Collect and size
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 2}), (:N {v: 1})
      """
    When executing query:
      """
      MATCH (n:N) WITH collect(n.v) AS vs RETURN size(vs) AS s
      """
    Then the result should be, in any order:
      | s |
      | 2 |
    And no side effects

  Scenario: Distinct aggregation
    Given an empty graph
    And having executed:
      """
      CREATE (:Y {v: 10}), (:Y {v: 10}), (:Y {v: 40})
      """
    When executing query:
      """
      MATCH (y:Y) RETURN count(DISTINCT y.v) AS c, avg(DISTINCT y.v) AS a
      """
    Then the result should be, in any order:
      | c | a    |
      | 2 | 25.0 |
    And no side effects

  Scenario: Order by with limit
    Given an empty graph
    And having executed:
      """
      CREATE (:Z {v: 3}), (:Z {v: 1}), (:Z {v: 2})
      """
    When executing query:
      """
      MATCH (z:Z) RETURN z.v AS v ORDER BY v DESC LIMIT 2
      """
    Then the result should be, in order:
      | v |
      | 3 |
      | 2 |
    And no side effects

  Scenario: Return distinct values
    Given an empty graph
    And having executed:
      """
      CREATE (:D {v: 1}), (:D {v: 1}), (:D {v: 2})
      """
    When executing query:
      """
      MATCH (d:D) RETURN DISTINCT d.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
    And no side effects
