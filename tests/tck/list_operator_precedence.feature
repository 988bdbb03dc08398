Feature: ListOperatorPrecedence

  # Operator precedence and binding around list indexing, slicing,
  # concatenation, IN, NOT, unary minus, and chained comparisons — the
  # postfix [] binds tighter than unary/binary operators, + concatenates
  # lists (and appends scalars), IN sits at comparison level and composes
  # with boolean operators without parentheses.

  Background:
    Given an empty graph

  Scenario: Postfix index binds tighter than unary minus
    When executing query:
      """
      RETURN -[1,2][0] AS x
      """
    Then the result should be, in any order:
      | x  |
      | -1 |
    And no side effects

  Scenario: Index expression may itself be arithmetic
    When executing query:
      """
      RETURN [1,2,3][1+1] AS x
      """
    Then the result should be, in any order:
      | x |
      | 3 |
    And no side effects

  Scenario: Chained slice then index
    When executing query:
      """
      RETURN [1,2,3][1..][0] AS x, [[1,2],[3]][0][1] AS y
      """
    Then the result should be, in any order:
      | x | y |
      | 2 | 2 |
    And no side effects

  Scenario: Concatenation of lists and scalar append
    When executing query:
      """
      RETURN [1,2] + [3] AS a, [1,2] + 3 AS b, 1 + [2,3] AS c
      """
    Then the result should be, in any order:
      | a         | b         | c         |
      | [1, 2, 3] | [1, 2, 3] | [1, 2, 3] |
    And no side effects

  Scenario: Indexing a parenthesized concatenation
    When executing query:
      """
      RETURN ([1,2] + [3])[2] AS x, size([1,2] + [3]) AS n
      """
    Then the result should be, in any order:
      | x | n |
      | 3 | 3 |
    And no side effects

  Scenario: IN binds looser than list concatenation
    When executing query:
      """
      RETURN 3 IN [1,2] + [3] AS x
      """
    Then the result should be, in any order:
      | x    |
      | true |
    And no side effects

  Scenario: NOT composes with IN without parentheses
    When executing query:
      """
      RETURN NOT 1 IN [1,2] AS a, NOT (1 IN [1,2]) AS b, NOT 9 IN [1,2] AS c
      """
    Then the result should be, in any order:
      | a     | b     | c    |
      | false | false | true |
    And no side effects

  Scenario: IN composes with AND at boolean level
    When executing query:
      """
      RETURN 2 IN [1,2] AND 3 IN [3] AS x
      """
    Then the result should be, in any order:
      | x    |
      | true |
    And no side effects

  Scenario: Negative index counts from the end
    When executing query:
      """
      RETURN [1,2,3][-1] AS a, [1,2,3][-3] AS b
      """
    Then the result should be, in any order:
      | a | b |
      | 3 | 1 |
    And no side effects

  Scenario: Out-of-range index is null in both directions
    When executing query:
      """
      RETURN [1,2,3][5] AS a, [1,2,3][-5] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: Slice bounds clamp to list size
    When executing query:
      """
      RETURN [1,2,3][1..10] AS a, [1,2,3][-10..2] AS b, [1,2,3][2..1] AS c
      """
    Then the result should be, in any order:
      | a      | b      | c  |
      | [2, 3] | [1, 2] | [] |
    And no side effects

  Scenario: Null index and null slice bound
    When executing query:
      """
      RETURN [1,2][null] AS a, [1,2][0..null] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: IN with null element and null subject
    When executing query:
      """
      RETURN null IN [1] AS a, 1 IN [null] AS b, 1 IN [1, null] AS c,
             1 IN [] AS d, null IN [] AS e
      """
    Then the result should be, in any order:
      | a    | b    | c    | d     | e     |
      | null | null | true | false | false |
    And no side effects

  Scenario: Chained comparisons conjoin pairwise
    When executing query:
      """
      RETURN 1 < 2 < 3 AS a, 3 > 2 > 1 AS b, 1 < 2 > null AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | true | true | null |
    And no side effects

  Scenario: Comparison across incomparable types is null
    When executing query:
      """
      RETURN 'a' < 1 AS x
      """
    Then the result should be, in any order:
      | x    |
      | null |
    And no side effects

  Scenario: Slicing a range call result
    When executing query:
      """
      RETURN range(1,10)[2..4] AS x
      """
    Then the result should be, in any order:
      | x      |
      | [3, 4] |
    And no side effects

  Scenario: List comprehension result indexes like any list
    When executing query:
      """
      RETURN [x IN [1,2,3] WHERE x > 1 | x * 10][0] AS x
      """
    Then the result should be, in any order:
      | x  |
      | 20 |
    And no side effects

  Scenario: reduce result composes with arithmetic operators
    When executing query:
      """
      RETURN reduce(s = 0, x IN [1,2,3] | s + x) * 2 AS x
      """
    Then the result should be, in any order:
      | x  |
      | 12 |
    And no side effects

  Scenario: reduce with an empty-list accumulator infers its type
    When executing query:
      """
      RETURN reduce(acc = [], x IN [1,2] | acc + [x * 2]) AS a,
             reduce(acc = [], x IN [[1],[2,3]] | acc + x) AS b,
             reduce(acc = [], w IN ['a','b'] | acc + [w]) AS c
      """
    Then the result should be, in any order:
      | a      | b         | c          |
      | [2, 4] | [1, 2, 3] | ['a', 'b'] |
    And no side effects

  Scenario: Searched CASE treats a null predicate as no match
    When executing query:
      """
      RETURN CASE WHEN null THEN 'a' ELSE 'b' END AS a,
             CASE WHEN null THEN 'a' WHEN true THEN 'c' ELSE 'b' END AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 'b' | 'c' |
    And no side effects

  Scenario: Distinct over list and map values
    When executing query:
      """
      UNWIND [[1,2],[1,2],[3]] AS x
      WITH DISTINCT x
      RETURN x ORDER BY x[0]
      """
    Then the result should be, in order:
      | x      |
      | [1, 2] |
      | [3]    |
    And no side effects
