Feature: WithDistinctAggregation

  Scenario: WITH DISTINCT collapses duplicate projections
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2}), (:P {g: 'b', v: 3})
      """
    When executing query:
      """
      MATCH (p:P) WITH DISTINCT p.g AS g RETURN g
      """
    Then the result should be, in any order:
      | g   |
      | 'a' |
      | 'b' |
    And no side effects

  Scenario: Aggregate over an aggregate via WITH
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 1}), (:P {g: 'a', v: 2}), (:P {g: 'b', v: 30})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.g AS g, sum(p.v) AS s RETURN max(s) AS biggest, count(*) AS groups
      """
    Then the result should be, in any order:
      | biggest | groups |
      | 30      | 2      |
    And no side effects

  Scenario: Grouped aggregation keyed on an expression
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 2}), (:P {v: 3}), (:P {v: 4})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.v % 2 AS parity, count(*) AS n
      """
    Then the result should be, in any order:
      | parity | n |
      | 0      | 2 |
      | 1      | 2 |
    And no side effects

  Scenario: collect DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE (:P {v: 1}), (:P {v: 1}), (:P {v: 2})
      """
    When executing query:
      """
      MATCH (p:P) WITH p.v AS v ORDER BY v RETURN collect(DISTINCT v) AS vs
      """
    Then the result should be, in any order:
      | vs     |
      | [1, 2] |
    And no side effects

  Scenario: Aggregation after OPTIONAL MATCH counts null-extended rows
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})-[:T]->(:Q), (:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) OPTIONAL MATCH (p)-[:T]->(q) RETURN count(*) AS rows, count(q) AS matched
      """
    Then the result should be, in any order:
      | rows | matched |
      | 2    | 1       |
    And no side effects

  Scenario: min and max ignore nulls but return null over none
    Given an empty graph
    And having executed:
      """
      CREATE (:P {g: 'a', v: 5}), (:P {g: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) RETURN p.g AS g, max(p.v) AS m
      """
    Then the result should be, in any order:
      | g   | m    |
      | 'a' | 5    |
      | 'b' | null |
    And no side effects
