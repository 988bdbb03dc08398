Feature: Expressions3

  Scenario: Searched CASE picks the first true branch
    Given any graph
    When executing query:
      """
      UNWIND [1, 5, 10] AS v
      RETURN v, CASE WHEN v < 3 THEN 'low' WHEN v < 8 THEN 'mid' ELSE 'high' END AS b
      """
    Then the result should be, in any order:
      | v  | b      |
      | 1  | 'low'  |
      | 5  | 'mid'  |
      | 10 | 'high' |
    And no side effects

  Scenario: Simple CASE on a value
    Given any graph
    When executing query:
      """
      UNWIND ['a', 'b', 'c'] AS v
      RETURN CASE v WHEN 'a' THEN 1 WHEN 'b' THEN 2 ELSE 0 END AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |
      | 2 |
      | 0 |
    And no side effects

  Scenario: CASE without ELSE defaults to null
    Given any graph
    When executing query:
      """
      UNWIND [1, 2] AS v
      RETURN CASE v WHEN 1 THEN 'one' END AS s
      """
    Then the result should be, in any order:
      | s     |
      | 'one' |
      | null  |
    And no side effects

  Scenario: Simple CASE never matches on null operand
    Given any graph
    When executing query:
      """
      WITH null AS v
      RETURN CASE v WHEN null THEN 'yes' ELSE 'no' END AS s
      """
    Then the result should be, in any order:
      | s    |
      | 'no' |
    And no side effects

  Scenario: Unary minus binds tighter than subtraction
    Given any graph
    When executing query:
      """
      RETURN 5 - -3 AS v, -(2 + 3) AS w
      """
    Then the result should be, in any order:
      | v | w  |
      | 8 | -5 |
    And no side effects

  Scenario: Exponentiation produces a float
    Given any graph
    When executing query:
      """
      RETURN 2 ^ 10 AS v
      """
    Then the result should be, in any order:
      | v      |
      | 1024.0 |
    And no side effects

  Scenario: Multiplication before addition
    Given any graph
    When executing query:
      """
      RETURN 2 + 3 * 4 AS v, (2 + 3) * 4 AS w
      """
    Then the result should be, in any order:
      | v  | w  |
      | 14 | 20 |
    And no side effects

  Scenario: String concatenation with plus coerces numbers
    Given any graph
    When executing query:
      """
      RETURN 'n=' + 5 AS a, 1 + 'x' AS b
      """
    Then the result should be, in any order:
      | a     | b    |
      | 'n=5' | '1x' |
    And no side effects

  Scenario: Comparison operators on integers
    Given any graph
    When executing query:
      """
      RETURN 1 < 2 AS a, 2 <= 2 AS b, 3 > 4 AS c, 4 >= 5 AS d, 1 <> 2 AS e
      """
    Then the result should be, in any order:
      | a    | b    | c     | d     | e    |
      | true | true | false | false | true |
    And no side effects

  Scenario: Boolean operators three-valued with null
    Given any graph
    When executing query:
      """
      WITH null AS u
      RETURN (true OR u) AS a, (false AND u) AS b, (true AND u) AS c, NOT u AS d
      """
    Then the result should be, in any order:
      | a    | b     | c    | d    |
      | true | false | null | null |
    And no side effects

  Scenario: Equality between different numeric types
    Given any graph
    When executing query:
      """
      RETURN 1 = 1.0 AS a, 1 = 1.5 AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |
    And no side effects

  Scenario: IS NULL and IS NOT NULL on expressions
    Given any graph
    When executing query:
      """
      WITH null AS u
      RETURN u IS NULL AS a, u IS NOT NULL AS b, 1 IS NULL AS c
      """
    Then the result should be, in any order:
      | a    | b     | c     |
      | true | false | false |
    And no side effects

  Scenario: Nested CASE expressions
    Given any graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS v
      RETURN CASE WHEN v > 1 THEN CASE WHEN v > 2 THEN 'big' ELSE 'mid' END
             ELSE 'small' END AS s
      """
    Then the result should be, in any order:
      | s       |
      | 'small' |
      | 'mid'   |
      | 'big'   |
    And no side effects

  Scenario: CASE result used in an aggregation
    Given any graph
    When executing query:
      """
      UNWIND [1, 2, 3, 4, 5] AS v
      RETURN sum(CASE WHEN v % 2 = 0 THEN v ELSE 0 END) AS even_sum
      """
    Then the result should be, in any order:
      | even_sum |
      | 6        |
    And no side effects

  Scenario: Modulo on floats
    Given any graph
    When executing query:
      """
      RETURN 5.5 % 2 AS v
      """
    Then the result should be, in any order:
      | v   |
      | 1.5 |
    And no side effects
