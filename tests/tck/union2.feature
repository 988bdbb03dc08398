Feature: Union2

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:A {v: 1}), (:A {v: 2}), (:B {v: 2}), (:B {v: 3})
      """

  Scenario: UNION deduplicates across arms
    When executing query:
      """
      MATCH (a:A) RETURN a.v AS v
      UNION
      MATCH (b:B) RETURN b.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: UNION ALL keeps duplicates
    When executing query:
      """
      MATCH (a:A) RETURN a.v AS v
      UNION ALL
      MATCH (b:B) RETURN b.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: UNION of literal returns
    When executing query:
      """
      RETURN 1 AS v UNION RETURN 1 AS v UNION RETURN 2 AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Three-arm UNION ALL
    When executing query:
      """
      RETURN 'x' AS s UNION ALL RETURN 'y' AS s UNION ALL RETURN 'x' AS s
      """
    Then the result should be, in any order:
      | s   |
      | 'x' |
      | 'y' |
      | 'x' |
    And no side effects

  Scenario: UNION with different column names is an error
    When executing query:
      """
      RETURN 1 AS a UNION RETURN 2 AS b
      """
    Then a SyntaxError should be raised at compile time: DifferentColumnsInUnion
    And no side effects

  Scenario: UNION dedup treats nulls as equal
    When executing query:
      """
      MATCH (a:A) RETURN a.missing AS v
      UNION
      MATCH (b:B) RETURN b.missing AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects
