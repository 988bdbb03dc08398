Feature: ListSliceIndex

  # List subscript and slice semantics: zero-based indexing, negative
  # indices from the end, out-of-range -> null, slices clamp, open
  # bounds, null operands propagate.

  Background:
    Given an empty graph

  Scenario: Positive and negative indexing
    When executing query:
      """
      WITH [10, 20, 30, 40] AS l
      RETURN l[0] AS a, l[3] AS b, l[-1] AS c, l[-4] AS d
      """
    Then the result should be, in any order:
      | a  | b  | c  | d  |
      | 10 | 40 | 40 | 10 |
    And no side effects

  Scenario: Out-of-range index yields null
    When executing query:
      """
      WITH [10, 20] AS l
      RETURN l[5] AS a, l[-5] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: Basic slice is end-exclusive
    When executing query:
      """
      WITH [1, 2, 3, 4, 5] AS l
      RETURN l[1..3] AS s
      """
    Then the result should be, in any order:
      | s      |
      | [2, 3] |
    And no side effects

  Scenario: Open-ended slices
    When executing query:
      """
      WITH [1, 2, 3, 4, 5] AS l
      RETURN l[2..] AS a, l[..2] AS b
      """
    Then the result should be, in any order:
      | a         | b      |
      | [3, 4, 5] | [1, 2] |
    And no side effects

  Scenario: Negative slice bounds count from the end
    When executing query:
      """
      WITH [1, 2, 3, 4, 5] AS l
      RETURN l[-3..-1] AS s
      """
    Then the result should be, in any order:
      | s      |
      | [3, 4] |
    And no side effects

  Scenario: Slice bounds clamp to the list
    When executing query:
      """
      WITH [1, 2, 3] AS l
      RETURN l[1..10] AS a, l[-10..2] AS b
      """
    Then the result should be, in any order:
      | a      | b      |
      | [2, 3] | [1, 2] |
    And no side effects

  Scenario: Empty slice when bounds cross
    When executing query:
      """
      WITH [1, 2, 3] AS l
      RETURN l[2..1] AS s
      """
    Then the result should be, in any order:
      | s  |
      | [] |
    And no side effects

  Scenario: Indexing a null list is null
    When executing query:
      """
      WITH null AS l
      RETURN l[0] AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: Null index is null
    When executing query:
      """
      WITH [1, 2, 3] AS l, null AS i
      RETURN l[i] AS a
      """
    Then the result should be, in any order:
      | a    |
      | null |
    And no side effects

  Scenario: Index expression computed per row
    When executing query:
      """
      UNWIND [0, 1, 2] AS i
      RETURN [10, 20, 30][i] AS v
      """
    Then the result should be, in any order:
      | v  |
      | 10 |
      | 20 |
      | 30 |
    And no side effects

  Scenario: Slicing the output of range and size of a slice
    When executing query:
      """
      RETURN range(0, 9)[3..6] AS s, size(range(0, 9)[3..6]) AS n
      """
    Then the result should be, in any order:
      | s         | n |
      | [3, 4, 5] | 3 |
    And no side effects

  Scenario: Chained head and tail over a slice
    When executing query:
      """
      WITH [1, 2, 3, 4] AS l
      RETURN head(l[1..]) AS h, tail(l)[0] AS t, last(l[..3]) AS z
      """
    Then the result should be, in any order:
      | h | t | z |
      | 2 | 2 | 3 |
    And no side effects
