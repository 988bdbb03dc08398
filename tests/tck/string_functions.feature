Feature: StringFunctions

  Scenario: Case conversion, trim family, and reverse
    Given an empty graph
    When executing query:
      """
      RETURN toUpper('aBc') AS up, toLower('aBc') AS lo,
             trim('  x  ') AS t, lTrim('  x') AS l, rTrim('x  ') AS r,
             reverse('abc') AS rev
      """
    Then the result should be, in any order:
      | up    | lo    | t   | l   | r   | rev   |
      | 'ABC' | 'abc' | 'x' | 'x' | 'x' | 'cba' |
    And no side effects

  Scenario: substring, left, right, replace, split
    Given an empty graph
    When executing query:
      """
      RETURN substring('hello', 1, 3) AS sub, left('hello', 2) AS l,
             right('hello', 2) AS r, replace('aXbXc', 'X', '-') AS rep,
             split('a,b,c', ',') AS sp
      """
    Then the result should be, in any order:
      | sub   | l    | r    | rep     | sp              |
      | 'ell' | 'he' | 'lo' | 'a-b-c' | ['a', 'b', 'c'] |
    And no side effects

  Scenario: String predicates are null on null operands
    Given an empty graph
    When executing query:
      """
      RETURN null STARTS WITH 'a' AS a, 'abc' CONTAINS null AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: Regular expression match operator
    Given an empty graph
    And having executed:
      """
      CREATE (:W {s: 'apple'}), (:W {s: 'banana'}), (:W {s: 'cherry'})
      """
    When executing query:
      """
      MATCH (w:W) WHERE w.s =~ '.*an.*' RETURN w.s AS s
      """
    Then the result should be, in any order:
      | s        |
      | 'banana' |
    And no side effects

  Scenario: size of a string after concatenation
    Given an empty graph
    When executing query:
      """
      RETURN size('ab' + 'cd') AS n, 'ab' + 'cd' AS cat
      """
    Then the result should be, in any order:
      | n | cat    |
      | 4 | 'abcd' |
    And no side effects
