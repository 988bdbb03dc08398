Feature: ContainerEqualityMore

  # Extensions of ContainerNullEquality: negated equality (<>) over
  # null-poisoned containers, maps inside lists for IN, nested
  # containers, cross-kind container equality, and the equivalence
  # (not equality) semantics DISTINCT applies to lists with nulls.

  Background:
    Given an empty graph

  Scenario: Negated equality of null-poisoned lists is null
    When executing query:
      """
      RETURN [1, null] <> [1, null] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: Negated equality of definitely-different lists is true
    When executing query:
      """
      RETURN [1, null] <> [2, null] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
    And no side effects

  Scenario: Negated map equality with mismatched keys is true
    When executing query:
      """
      RETURN {a: 1} <> {b: 1} AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
    And no side effects

  Scenario: Null list operand keeps equality null
    When executing query:
      """
      WITH null AS n
      RETURN n = [1, 2] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: List against map is definitely false
    When executing query:
      """
      RETURN [1] = {a: 1} AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |
    And no side effects

  Scenario: Nested lists compare recursively through a null
    When executing query:
      """
      RETURN [[1, null], [2]] = [[1, null], [2]] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: Nested list mismatch at the outer level is false
    When executing query:
      """
      RETURN [[1, null]] = [[2, null]] AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |
    And no side effects

  Scenario: Map found in a list of maps
    When executing query:
      """
      RETURN {a: 1} IN [{a: 2}, {a: 1}] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
    And no side effects

  Scenario: Map with a null value against a concrete candidate is null
    When executing query:
      """
      RETURN {a: null} IN [{a: 1}] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: Map with mismatched keys is not in the list
    When executing query:
      """
      RETURN {a: 1} IN [{b: 1}] AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |
    And no side effects

  Scenario: Lists with nulls are equivalent for DISTINCT
    When executing query:
      """
      UNWIND [[1, null], [1, null], [1, 2]] AS x
      RETURN DISTINCT x AS v
      """
    Then the result should be, in any order:
      | v         |
      | [1, null] |
      | [1, 2]    |
    And no side effects

  Scenario: Lists with nulls group together in aggregation
    When executing query:
      """
      UNWIND [[1, null], [1, null], [2]] AS x
      RETURN x AS key, count(*) AS n
      """
    Then the result should be, in any order:
      | key       | n |
      | [1, null] | 2 |
      | [2]       | 1 |
    And no side effects

  Scenario: Container equality as a WHERE predicate drops null rows
    When executing query:
      """
      UNWIND [[1, 2], [1, null], [3, 4]] AS x
      WITH x WHERE x = [1, 2]
      RETURN x AS v
      """
    Then the result should be, in any order:
      | v      |
      | [1, 2] |
    And no side effects

  Scenario: Numeric coercion reaches nested lists
    When executing query:
      """
      RETURN [[1, 2]] = [[1.0, 2.0]] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
    And no side effects

  Scenario: Empty lists are equal
    When executing query:
      """
      RETURN [] = [] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
    And no side effects

  Scenario: Empty map equals empty map
    When executing query:
      """
      RETURN {} = {} AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
    And no side effects
