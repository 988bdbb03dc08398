Feature: Lists2

  Scenario: Positive list indexing
    Given any graph
    When executing query:
      """
      RETURN [10, 20, 30][1] AS v
      """
    Then the result should be, in any order:
      | v  |
      | 20 |
    And no side effects

  Scenario: Negative list indexing
    Given any graph
    When executing query:
      """
      RETURN [10, 20, 30][-1] AS v
      """
    Then the result should be, in any order:
      | v  |
      | 30 |
    And no side effects

  Scenario: Out-of-range index is null
    Given any graph
    When executing query:
      """
      RETURN [10, 20, 30][7] AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: List slice with both bounds
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3, 4, 5][1..3] AS v
      """
    Then the result should be, in any order:
      | v      |
      | [2, 3] |
    And no side effects

  Scenario: List slice with open upper bound
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3, 4, 5][2..] AS v
      """
    Then the result should be, in any order:
      | v         |
      | [3, 4, 5] |
    And no side effects

  Scenario: List slice with open lower bound
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3, 4, 5][..2] AS v
      """
    Then the result should be, in any order:
      | v      |
      | [1, 2] |
    And no side effects

  Scenario: List slice with negative bounds
    Given any graph
    When executing query:
      """
      RETURN [1, 2, 3, 4, 5][-3..-1] AS v
      """
    Then the result should be, in any order:
      | v      |
      | [3, 4] |
    And no side effects

  Scenario: range with default step
    Given any graph
    When executing query:
      """
      RETURN range(2, 5) AS v
      """
    Then the result should be, in any order:
      | v            |
      | [2, 3, 4, 5] |
    And no side effects

  Scenario: range with step includes the inclusive end
    Given any graph
    When executing query:
      """
      RETURN range(1, 10, 3) AS v
      """
    Then the result should be, in any order:
      | v             |
      | [1, 4, 7, 10] |
    And no side effects

  Scenario: List comprehension with filter and map
    Given any graph
    When executing query:
      """
      RETURN [x IN range(1, 5) WHERE x % 2 = 1 | x * 10] AS v
      """
    Then the result should be, in any order:
      | v            |
      | [10, 30, 50] |
    And no side effects

  Scenario: List comprehension with filter only
    Given any graph
    When executing query:
      """
      RETURN [x IN range(1, 6) WHERE x > 3] AS v
      """
    Then the result should be, in any order:
      | v         |
      | [4, 5, 6] |
    And no side effects

  Scenario: reduce computes a running total
    Given any graph
    When executing query:
      """
      RETURN reduce(acc = 0, x IN [1, 2, 3, 4] | acc + x) AS v
      """
    Then the result should be, in any order:
      | v  |
      | 10 |
    And no side effects

  Scenario: reduce builds a string
    Given any graph
    When executing query:
      """
      RETURN reduce(s = '', w IN ['a', 'b', 'c'] | s + w) AS v
      """
    Then the result should be, in any order:
      | v     |
      | 'abc' |
    And no side effects

  Scenario: any and all quantifiers
    Given any graph
    When executing query:
      """
      RETURN any(x IN [1, 2, 3] WHERE x > 2) AS a,
             all(x IN [1, 2, 3] WHERE x > 0) AS b,
             none(x IN [1, 2, 3] WHERE x > 5) AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | true | true | true |
    And no side effects

  Scenario: List concatenation with plus
    Given any graph
    When executing query:
      """
      RETURN [1, 2] + [3] AS v
      """
    Then the result should be, in any order:
      | v         |
      | [1, 2, 3] |
    And no side effects

  Scenario: Appending an element with plus
    Given any graph
    When executing query:
      """
      RETURN [1, 2] + 3 AS v
      """
    Then the result should be, in any order:
      | v         |
      | [1, 2, 3] |
    And no side effects

  Scenario: head last tail size
    Given any graph
    When executing query:
      """
      WITH [5, 6, 7] AS l
      RETURN head(l) AS h, last(l) AS t, tail(l) AS rest, size(l) AS n
      """
    Then the result should be, in any order:
      | h | t | rest   | n |
      | 5 | 7 | [6, 7] | 3 |
    And no side effects

  Scenario: head and last of empty list are null
    Given any graph
    When executing query:
      """
      WITH [] AS l RETURN head(l) AS h, last(l) AS t
      """
    Then the result should be, in any order:
      | h    | t    |
      | null | null |
    And no side effects

  Scenario: IN over list of lists
    Given any graph
    When executing query:
      """
      RETURN [1, 2] IN [[1, 2], [3]] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |
    And no side effects

  Scenario: reverse of a list
    Given any graph
    When executing query:
      """
      RETURN reverse([1, 2, 3]) AS v
      """
    Then the result should be, in any order:
      | v         |
      | [3, 2, 1] |
    And no side effects
