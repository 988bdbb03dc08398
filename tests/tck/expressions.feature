Feature: Expressions

  Scenario: Ternary null propagation in comparisons
    Given an empty graph
    And having executed:
      """
      CREATE (:T {v: 1})
      """
    When executing query:
      """
      MATCH (t:T) RETURN t.missing = 1 AS eq, t.missing IS NULL AS isn, 1 + t.missing AS plus
      """
    Then the result should be, in any order:
      | eq   | isn  | plus |
      | null | true | null |
    And no side effects

  Scenario: IN with null element is null when not found
    Given an empty graph
    And having executed:
      """
      CREATE (:U)
      """
    When executing query:
      """
      MATCH (:U) RETURN 2 IN [null, 1] AS a, 1 IN [null, 1] AS b, 3 IN [] AS c
      """
    Then the result should be, in any order:
      | a    | b    | c     |
      | null | true | false |
    And no side effects

  Scenario: CASE expression buckets
    Given an empty graph
    And having executed:
      """
      CREATE (:V {v: 5}), (:V {v: 15})
      """
    When executing query:
      """
      MATCH (x:V)
      RETURN x.v AS v, CASE WHEN x.v < 10 THEN 'small' ELSE 'big' END AS bucket
      """
    Then the result should be, in any order:
      | v  | bucket  |
      | 5  | 'small' |
      | 15 | 'big'   |
    And no side effects

  Scenario: List comprehension and reduce
    Given an empty graph
    And having executed:
      """
      CREATE (:W)
      """
    When executing query:
      """
      MATCH (:W)
      RETURN [x IN range(1, 4) WHERE x % 2 = 0 | x * 10] AS evens,
             reduce(acc = 0, x IN range(1, 4) | acc + x) AS total
      """
    Then the result should be, in any order:
      | evens    | total |
      | [20, 40] | 10    |
    And no side effects

  Scenario: String functions compose
    Given an empty graph
    And having executed:
      """
      CREATE (:S {name: '  Spark  '})
      """
    When executing query:
      """
      MATCH (s:S) RETURN toUpper(trim(s.name)) AS up, size(trim(s.name)) AS n
      """
    Then the result should be, in any order:
      | up      | n |
      | 'SPARK' | 5 |
    And no side effects

  Scenario: Out-of-range list index is null
    Given an empty graph
    And having executed:
      """
      CREATE (:L)
      """
    When executing query:
      """
      MATCH (:L) WITH [1, 2, 3] AS xs RETURN xs[1] AS second, xs[7] AS missing
      """
    Then the result should be, in any order:
      | second | missing |
      | 2      | null    |
    And no side effects

  Scenario: labels and type functions
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'A'})-[:KNOWS]->(:Person {name: 'B'})
      """
    When executing query:
      """
      MATCH (a:Person {name: 'A'})-[r]->() RETURN labels(a) AS ls, type(r) AS t
      """
    Then the result should be, in any order:
      | ls         | t       |
      | ['Person'] | 'KNOWS' |
    And no side effects
