Feature: FunctionsSurface2

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:X {s: 'hello', t: '', n: 5})
      """

  Scenario: isEmpty on strings
    When executing query:
      """
      MATCH (x:X)
      RETURN isEmpty(x.s) AS a, isEmpty(x.t) AS b, isEmpty(x.missing) AS c
      """
    Then the result should be, in any order:
      | a     | b    | c    |
      | false | true | null |
    And no side effects

  Scenario: isEmpty on lists
    When executing query:
      """
      RETURN isEmpty([]) AS a, isEmpty([1]) AS b, isEmpty([null]) AS c
      """
    Then the result should be, in any order:
      | a    | b     | c     |
      | true | false | false |
    And no side effects

  Scenario: isEmpty on maps
    When executing query:
      """
      RETURN isEmpty({}) AS a, isEmpty({k: 1}) AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |
    And no side effects

  Scenario: right returns the trailing characters
    When executing query:
      """
      MATCH (x:X)
      RETURN right(x.s, 3) AS a, right(x.s, 0) AS b, right('ab', 5) AS c
      """
    Then the result should be, in any order:
      | a     | b  | c    |
      | 'llo' | '' | 'ab' |
    And no side effects

  Scenario: left and right are null-safe
    When executing query:
      """
      MATCH (x:X)
      RETURN left(x.missing, 2) AS a, right(x.missing, 2) AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: log10 of powers of ten
    When executing query:
      """
      RETURN log10(1000.0) AS a, log10(1.0) AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 3.0 | 0.0 |
    And no side effects

  Scenario: timestamp is a non-negative millisecond count
    When executing query:
      """
      RETURN timestamp() >= 0 AS ok
      """
    Then the result should be, in any order:
      | ok   |
      | true |
    And no side effects

  Scenario: reverse works on lists as well as strings
    When executing query:
      """
      RETURN reverse([1, 2, 3]) AS l, reverse('abc') AS s
      """
    Then the result should be, in any order:
      | l         | s     |
      | [3, 2, 1] | 'cba' |
    And no side effects

  Scenario: isEmpty over node properties map
    When executing query:
      """
      MATCH (x:X) RETURN isEmpty(properties(x)) AS a
      """
    Then the result should be, in any order:
      | a     |
      | false |
    And no side effects
