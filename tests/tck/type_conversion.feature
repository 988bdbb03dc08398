Feature: TypeConversion

  Scenario: toInteger on strings and floats
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('42') AS a, toInteger(3.9) AS b, toInteger('nope') AS c,
             toInteger(null) AS d
      """
    Then the result should be, in any order:
      | a  | b | c    | d    |
      | 42 | 3 | null | null |
    And no side effects

  Scenario: toFloat on strings and integers
    Given an empty graph
    When executing query:
      """
      RETURN toFloat('2.5') AS a, toFloat(7) AS b, toFloat('x') AS c
      """
    Then the result should be, in any order:
      | a   | b   | c    |
      | 2.5 | 7.0 | null |
    And no side effects

  Scenario: toString on numbers and booleans
    Given an empty graph
    When executing query:
      """
      RETURN toString(42) AS a, toString(true) AS b, toString('s') AS c
      """
    Then the result should be, in any order:
      | a    | b      | c   |
      | '42' | 'true' | 's' |
    And no side effects

  Scenario: toBoolean on strings
    Given an empty graph
    When executing query:
      """
      RETURN toBoolean('true') AS a, toBoolean('FALSE') AS b, toBoolean('x') AS c,
             toBoolean(false) AS d
      """
    Then the result should be, in any order:
      | a    | b     | c    | d     |
      | true | false | null | false |
    And no side effects

  Scenario Outline: abs, sign, and rounding functions
    Given an empty graph
    When executing query:
      """
      RETURN <expr> AS out
      """
    Then the result should be, in any order:
      | out        |
      | <expected> |
    And no side effects

    Examples:
      | expr          | expected |
      | abs(-7)       | 7        |
      | sign(-0.1)    | -1       |
      | ceil(2.1)     | 3.0      |
      | floor(2.9)    | 2.0      |
      | round(2.5)    | 3.0      |
      | sqrt(16.0)    | 4.0      |
