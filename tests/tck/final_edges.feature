Feature: FinalEdges

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'ann', age: 30}), (:P {name: 'bob'}),
             (:P {name: 'cal', age: 25})
      """

  Scenario: String comparison is lexicographic in WHERE
    When executing query:
      """
      MATCH (p:P) WHERE p.name < 'bz' RETURN p.name AS name ORDER BY name
      """
    Then the result should be, in order:
      | name  |
      | 'ann' |
      | 'bob' |
    And no side effects

  Scenario: Arithmetic with a missing property is null and filters out
    When executing query:
      """
      MATCH (p:P) WHERE p.age + 1 > 20 RETURN p.name AS name ORDER BY name
      """
    Then the result should be, in order:
      | name  |
      | 'ann' |
      | 'cal' |
    And no side effects

  Scenario: CASE inside WHERE
    When executing query:
      """
      MATCH (p:P)
      WHERE CASE WHEN p.age IS NULL THEN true ELSE p.age > 28 END
      RETURN p.name AS name ORDER BY name
      """
    Then the result should be, in order:
      | name  |
      | 'ann' |
      | 'bob' |
    And no side effects

  Scenario: exists on property vs IS NOT NULL agree
    When executing query:
      """
      MATCH (p:P)
      RETURN p.name AS name, exists(p.age) AS e, p.age IS NOT NULL AS nn
      ORDER BY name
      """
    Then the result should be, in order:
      | name  | e     | nn    |
      | 'ann' | true  | true  |
      | 'bob' | false | false |
      | 'cal' | true  | true  |
    And no side effects

  Scenario: IN over strings with a null element
    When executing query:
      """
      MATCH (p:P)
      WITH p WHERE p.name IN ['ann', null, 'cal']
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And no side effects

  Scenario: Nullif-style CASE collapses to null for a sentinel
    When executing query:
      """
      UNWIND [1, 2, -1] AS x
      RETURN CASE x WHEN -1 THEN null ELSE x END AS v
      """
    Then the result should be, in any order:
      | v    |
      | 1    |
      | 2    |
      | null |
    And no side effects
