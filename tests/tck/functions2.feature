Feature: Functions2

  Scenario: Integer division truncates
    Given any graph
    When executing query:
      """
      RETURN 7 / 2 AS a, -7 / 2 AS b
      """
    Then the result should be, in any order:
      | a | b  |
      | 3 | -3 |
    And no side effects

  Scenario: Float division
    Given any graph
    When executing query:
      """
      RETURN 7.0 / 2 AS a, 7 / 2.0 AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 3.5 | 3.5 |
    And no side effects

  Scenario: Modulo keeps the dividend sign
    Given any graph
    When executing query:
      """
      RETURN 7 % 3 AS a, -7 % 3 AS b, 7 % -3 AS c
      """
    Then the result should be, in any order:
      | a | b  | c |
      | 1 | -1 | 1 |
    And no side effects

  Scenario: abs sign ceil floor round
    Given any graph
    When executing query:
      """
      RETURN abs(-4) AS a, sign(-3) AS s, ceil(2.1) AS c,
             floor(2.9) AS f, round(2.5) AS r
      """
    Then the result should be, in any order:
      | a | s  | c   | f   | r   |
      | 4 | -1 | 3.0 | 2.0 | 3.0 |
    And no side effects

  Scenario: sqrt exp log
    Given any graph
    When executing query:
      """
      RETURN sqrt(16) AS q, exp(0) AS e, log(1) AS l
      """
    Then the result should be, in any order:
      | q   | e   | l   |
      | 4.0 | 1.0 | 0.0 |
    And no side effects

  Scenario: toInteger parses and truncates
    Given any graph
    When executing query:
      """
      RETURN toInteger('42') AS a, toInteger(3.9) AS b, toInteger('nope') AS c
      """
    Then the result should be, in any order:
      | a  | b | c    |
      | 42 | 3 | null |
    And no side effects

  Scenario: toFloat parses
    Given any graph
    When executing query:
      """
      RETURN toFloat('2.5') AS a, toFloat(7) AS b, toFloat('x') AS c
      """
    Then the result should be, in any order:
      | a   | b   | c    |
      | 2.5 | 7.0 | null |
    And no side effects

  Scenario: toString on number and boolean
    Given any graph
    When executing query:
      """
      RETURN toString(42) AS a, toString(true) AS b
      """
    Then the result should be, in any order:
      | a    | b      |
      | '42' | 'true' |
    And no side effects

  Scenario: toBoolean parses
    Given any graph
    When executing query:
      """
      RETURN toBoolean('true') AS a, toBoolean('false') AS b, toBoolean('x') AS c
      """
    Then the result should be, in any order:
      | a    | b     | c    |
      | true | false | null |
    And no side effects

  Scenario: coalesce picks the first non-null
    Given any graph
    When executing query:
      """
      RETURN coalesce(null, null, 7, 9) AS v, coalesce(null, null) AS w
      """
    Then the result should be, in any order:
      | v | w    |
      | 7 | null |
    And no side effects

  Scenario: trim family
    Given any graph
    When executing query:
      """
      RETURN trim('  x  ') AS t, lTrim('  x') AS l, rTrim('x  ') AS r
      """
    Then the result should be, in any order:
      | t   | l   | r   |
      | 'x' | 'x' | 'x' |
    And no side effects

  Scenario: case conversion and reverse
    Given any graph
    When executing query:
      """
      RETURN toUpper('aBc') AS u, toLower('AbC') AS l, reverse('abc') AS r
      """
    Then the result should be, in any order:
      | u     | l     | r     |
      | 'ABC' | 'abc' | 'cba' |
    And no side effects

  Scenario: substring with and without length
    Given any graph
    When executing query:
      """
      RETURN substring('hello', 1, 3) AS a, substring('hello', 2) AS b
      """
    Then the result should be, in any order:
      | a     | b     |
      | 'ell' | 'llo' |
    And no side effects

  Scenario: replace and split
    Given any graph
    When executing query:
      """
      RETURN replace('one,two', ',', '-') AS r, split('a:b:c', ':') AS s
      """
    Then the result should be, in any order:
      | r         | s               |
      | 'one-two' | ['a', 'b', 'c'] |
    And no side effects

  Scenario: left and right take prefixes and suffixes
    Given any graph
    When executing query:
      """
      RETURN left('hello', 2) AS l, right('hello', 2) AS r
      """
    Then the result should be, in any order:
      | l    | r    |
      | 'he' | 'lo' |
    And no side effects

  Scenario: size of a string
    Given any graph
    When executing query:
      """
      RETURN size('hello') AS n, size('') AS z
      """
    Then the result should be, in any order:
      | n | z |
      | 5 | 0 |
    And no side effects

  Scenario: Trigonometry at zero
    Given any graph
    When executing query:
      """
      RETURN sin(0) AS s, cos(0) AS c, tan(0) AS t, atan(0) AS a
      """
    Then the result should be, in any order:
      | s   | c   | t   | a   |
      | 0.0 | 1.0 | 0.0 | 0.0 |
    And no side effects

  Scenario: degrees and radians round-trip
    Given any graph
    When executing query:
      """
      RETURN degrees(0) AS d, radians(0) AS r
      """
    Then the result should be, in any order:
      | d   | r   |
      | 0.0 | 0.0 |
    And no side effects

  Scenario: e and pi constants
    Given any graph
    When executing query:
      """
      RETURN e() > 2.7 AND e() < 2.8 AS e_ok, pi() > 3.1 AND pi() < 3.2 AS pi_ok
      """
    Then the result should be, in any order:
      | e_ok | pi_ok |
      | true | true  |
    And no side effects

  Scenario: Functions propagate null arguments
    Given any graph
    When executing query:
      """
      RETURN toUpper(null) AS a, abs(null) AS b, size(null) AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | null | null |
    And no side effects
