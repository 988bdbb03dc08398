Feature: AggregationNulls

  Scenario: count distinguishes star from expression
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(*) AS stars, count(p.v) AS vals
      """
    Then the result should be, in any order:
      | stars | vals |
      | 3     | 2    |
    And no side effects

  Scenario: Aggregates skip nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 10}), (:P {v: 20}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) RETURN sum(p.v) AS s, avg(p.v) AS a, min(p.v) AS mn, max(p.v) AS mx
      """
    Then the result should be, in any order:
      | s  | a    | mn | mx |
      | 30 | 15.0 | 10 | 20 |
    And no side effects

  Scenario: collect ignores nulls
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P), (:P {v: 3})
      """
    When executing query:
      """
      MATCH (p:P) WITH p ORDER BY p.v RETURN collect(p.v) AS vs
      """
    Then the result should be, in any order:
      | vs     |
      | [1, 3] |
    And no side effects

  Scenario: Aggregation over no rows
    Given an empty graph
    When executing query:
      """
      MATCH (n:Nothing) RETURN count(n) AS c, sum(n.v) AS s, max(n.v) AS m, collect(n.v) AS l
      """
    Then the result should be, in any order:
      | c | s | m    | l  |
      | 0 | 0 | null | [] |
    And no side effects

  Scenario: Grouping key may be null
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2}), (:P {v: 5})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.g AS g, sum(p.v) AS s
      """
    Then the result should be, in any order:
      | g    | s |
      | 'a'  | 3 |
      | null | 5 |
    And no side effects

  Scenario: count DISTINCT versus plain count
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 1}), (:P {v: 2}), (:P)
      """
    When executing query:
      """
      MATCH (p:P) RETURN count(p.v) AS c, count(DISTINCT p.v) AS d
      """
    Then the result should be, in any order:
      | c | d |
      | 3 | 2 |
    And no side effects

  Scenario: min and max over strings
    Given an empty graph
    And having executed:
      """
      CREATE (:P {s: 'pear'}), (:P {s: 'apple'}), (:P {s: 'quince'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN min(p.s) AS mn, max(p.s) AS mx
      """
    Then the result should be, in any order:
      | mn      | mx       |
      | 'apple' | 'quince' |
    And no side effects
