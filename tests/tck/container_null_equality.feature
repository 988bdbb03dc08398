Feature: ContainerNullEquality

  # Ternary equality over lists/maps containing nulls, and IN over lists
  # with null elements — openCypher's Equality/Comparability semantics:
  # a definite structural mismatch is false, a null-valued element
  # comparison poisons the result to null, and IN is a ternary
  # disjunction over element equalities (true beats null beats false).

  Background:
    Given an empty graph

  Scenario: Lists equal up to a null element compare to null
    When executing query:
      """
      RETURN [1, null] = [1, null] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: A definite element mismatch beats a null element
    When executing query:
      """
      RETURN [1, null] = [2, null] AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |
    And no side effects

  Scenario: Null against a concrete element is null
    When executing query:
      """
      RETURN [1, 2] = [1, null] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: Length mismatch is definitely false even with nulls
    When executing query:
      """
      RETURN [1, null] = [1, null, 3] AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |
    And no side effects

  Scenario: Numeric coercion applies inside lists
    When executing query:
      """
      RETURN [1, 2] = [1.0, 2.0] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
    And no side effects

  Scenario: Map with a null value compares to null when keys line up
    When executing query:
      """
      RETURN {a: 1, b: null} = {a: 1, b: null} AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: Key-set mismatch is definitely false
    When executing query:
      """
      RETURN {a: 1} = {b: 1} AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |
    And no side effects

  Scenario: null IN an empty list is false
    When executing query:
      """
      RETURN null IN [] AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |
    And no side effects

  Scenario: null IN a non-empty list is null
    When executing query:
      """
      RETURN null IN [1] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: IN finds a definite match past a null element
    When executing query:
      """
      RETURN 1 IN [null, 1] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
    And no side effects

  Scenario: IN with no definite match but a null element is null
    When executing query:
      """
      RETURN 2 IN [null, 1] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: List IN list-of-lists with a definite match
    When executing query:
      """
      RETURN [1, 2] IN [[1, null], [1, 2]] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
    And no side effects

  Scenario: List IN list-of-lists with only a null-poisoned candidate
    When executing query:
      """
      RETURN [1, 3] IN [[1, null]] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects
