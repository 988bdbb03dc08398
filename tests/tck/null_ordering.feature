Feature: NullOrdering

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a', v: 3}), (:P {name: 'b', v: 1}),
             (:P {name: 'c'}), (:P {name: 'd', v: 2})
      """

  Scenario: Null sorts last ascending
    When executing query:
      """
      MATCH (p:P) RETURN p.name AS name, p.v AS v ORDER BY p.v ASC
      """
    Then the result should be, in order:
      | name | v    |
      | 'b'  | 1    |
      | 'd'  | 2    |
      | 'a'  | 3    |
      | 'c'  | null |
    And no side effects

  Scenario: Null sorts first descending
    When executing query:
      """
      MATCH (p:P) RETURN p.name AS name, p.v AS v ORDER BY p.v DESC
      """
    Then the result should be, in order:
      | name | v    |
      | 'c'  | null |
      | 'a'  | 3    |
      | 'd'  | 2    |
      | 'b'  | 1    |
    And no side effects

  Scenario: DISTINCT treats nulls as equal
    When executing query:
      """
      MATCH (p:P) WITH DISTINCT p.v / p.v AS one RETURN one ORDER BY one ASC
      """
    Then the result should be, in order:
      | one  |
      | 1    |
      | null |
    And no side effects

  Scenario: Aggregates skip nulls
    When executing query:
      """
      MATCH (p:P)
      RETURN count(p.v) AS cnt, count(*) AS all, min(p.v) AS mn,
             max(p.v) AS mx, avg(p.v) AS av
      """
    Then the result should be, in any order:
      | cnt | all | mn | mx | av  |
      | 3   | 4   | 1  | 3  | 2.0 |
    And no side effects

  Scenario: collect drops nulls
    When executing query:
      """
      MATCH (p:P) RETURN collect(p.v) AS vs
      """
    Then the result should be, in any order (ignoring element order for lists):
      | vs        |
      | [1, 2, 3] |
    And no side effects

  Scenario: IN over a list containing null
    Given an empty graph
    When executing query:
      """
      RETURN 1 IN [1, null] AS a, 2 IN [1, null] AS b, null IN [1, 2] AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | true | null | null |
    And no side effects
