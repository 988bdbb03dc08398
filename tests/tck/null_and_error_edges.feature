Feature: NullAndErrorEdges

  # Round-7 corpus growth (VERDICT r6 task #6): the r6 compile bugs
  # clustered in null/empty edge cases of expression evaluation, so pin
  # the whole family — error semantics and null-edges for arithmetic,
  # strings, containers, higher-order functions, aggregates, and casts.
  #
  # Engine stance where Neo4j RAISES but Spark yields null (integer
  # division by zero, modulo zero): this engine follows the reference
  # (Morpheus runs on Spark with the same non-ANSI semantics and
  # blacklists the corresponding TCK error scenarios), so the null
  # results below are PINNED parity, not accidents.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {name: 'a', v: 1}), (:N {name: 'b'})
      """

  # ---- arithmetic nulls and zero divisors ---------------------------------

  Scenario: Integer division by zero yields null (reference parity)
    When executing query:
      """
      RETURN 1 / 0 AS a, 1.0 / 0.0 AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: Modulo zero yields null (reference parity)
    When executing query:
      """
      RETURN 1 % 0 AS a, 1.5 % 0.0 AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: Null propagates through every arithmetic operator
    When executing query:
      """
      RETURN 1 + null AS a, null - 1 AS b, 2 * null AS c,
             null / 2 AS d, null % 2 AS e, 2 ^ null AS f, -null AS g
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    | e    | f    | g    |
      | null | null | null | null | null | null | null |
    And no side effects

  Scenario: String and list concatenation with null operands
    When executing query:
      """
      RETURN 'a' + null AS a, null + 'b' AS b, [1] + null AS c
      """
    Then the result should be, in any order:
      | a    | b    | c         |
      | null | null | [1, null] |
    And no side effects

  # ---- logarithms at the domain edge (java.lang.Math semantics) -----------

  Scenario: log and log10 of zero are negative infinity
    When executing query:
      """
      RETURN log(0) < -1.0 AS a, log10(0) < -1.0 AS b,
             log(0) + 1 = log(0) AS stays_inf
      """
    Then the result should be, in any order:
      | a    | b    | stays_inf |
      | true | true | true      |
    And no side effects

  Scenario: log of a negative number is NaN (not null), log of null is null
    # NaN ordering follows Spark SQL (NaN sorts greatest, NaN = NaN), so
    # the assertion is NaN-ness via non-nullness + self-equality rather
    # than Java comparison semantics
    When executing query:
      """
      RETURN log(-1) IS NOT NULL AS nn, log(-1) = log(-1) AS self_eq,
             log(null) AS n
      """
    Then the result should be, in any order:
      | nn   | self_eq | n    |
      | true | true    | null |
    And no side effects

  # ---- substring / string function edges ----------------------------------

  Scenario: substring length clamps at the end of the string
    When executing query:
      """
      RETURN substring('hello', 3, 99) AS a, substring('hello', 99) AS b,
             substring('hello', 0, 0) AS c
      """
    Then the result should be, in any order:
      | a    | b  | c  |
      | 'lo' | '' | '' |
    And no side effects

  Scenario: String functions propagate null
    When executing query:
      """
      RETURN trim(null) AS a, toUpper(null) AS b, split(null, ',') AS c,
             replace(null, 'a', 'b') AS d, left(null, 2) AS e,
             reverse(null) AS f
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    | e    | f    |
      | null | null | null | null | null | null |
    And no side effects

  Scenario: String predicates with null operands are null
    When executing query:
      """
      RETURN 'abc' STARTS WITH null AS a, null ENDS WITH 'c' AS b,
             null CONTAINS null AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | null | null |
    And no side effects

  Scenario: Regular expression match with null operands is null
    When executing query:
      """
      RETURN 'abc' =~ null AS a, null =~ 'a.*' AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  # ---- casts on malformed input --------------------------------------------

  Scenario: toInteger and toFloat on unparseable strings yield null
    When executing query:
      """
      RETURN toInteger('abc') AS a, toFloat('x1') AS b,
             toInteger('') AS c, toBoolean('maybe') AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |
    And no side effects

  Scenario: toInteger truncates numeric strings with decimals
    When executing query:
      """
      RETURN toInteger('3.9') AS a, toInteger(3.9) AS b, toInteger(-3.9) AS c
      """
    Then the result should be, in any order:
      | a | b | c  |
      | 3 | 3 | -3 |
    And no side effects

  # ---- container index / slice out of range --------------------------------

  Scenario: List index out of range is null, negative counts from the end
    When executing query:
      """
      WITH [1, 2, 3] AS xs
      RETURN xs[7] AS a, xs[-1] AS b, xs[-7] AS c, xs[null] AS d
      """
    Then the result should be, in any order:
      | a    | b | c    | d    |
      | null | 3 | null | null |
    And no side effects

  Scenario: List slices clamp to the list bounds
    When executing query:
      """
      WITH [1, 2, 3] AS xs
      RETURN xs[1..10] AS a, xs[-5..99] AS b, xs[2..1] AS c, xs[0..null] AS d
      """
    Then the result should be, in any order:
      | a      | b         | c  | d    |
      | [2, 3] | [1, 2, 3] | [] | null |
    And no side effects

  Scenario: Map access of a missing key is null
    When executing query:
      """
      WITH {a: 1} AS m RETURN m.missing AS x
      """
    Then the result should be, in any order:
      | x    |
      | null |
    And no side effects

  # ---- higher-order functions over null / empty lists -----------------------

  Scenario: List comprehension over a null list is null
    When executing query:
      """
      RETURN [x IN null | x + 1] AS a, [x IN null WHERE x > 0] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: Quantifiers over a null list are null
    When executing query:
      """
      RETURN any(x IN null WHERE x) AS a, all(x IN null WHERE x) AS b,
             none(x IN null WHERE x) AS c, single(x IN null WHERE x) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |
    And no side effects

  Scenario: Quantifiers over an empty list
    When executing query:
      """
      WITH [] AS xs
      RETURN any(x IN xs WHERE x > 0) AS a, all(x IN xs WHERE x > 0) AS b,
             none(x IN xs WHERE x > 0) AS c, single(x IN xs WHERE x > 0) AS d
      """
    Then the result should be, in any order:
      | a     | b    | c    | d     |
      | false | true | true | false |
    And no side effects

  Scenario: reduce over a null list is null
    When executing query:
      """
      RETURN reduce(acc = 0, x IN null | acc + x) AS r
      """
    Then the result should be, in any order:
      | r    |
      | null |
    And no side effects

  Scenario: reduce over an empty list returns the initial value
    When executing query:
      """
      RETURN reduce(acc = 42, x IN [] | acc + x) AS r
      """
    Then the result should be, in any order:
      | r  |
      | 42 |
    And no side effects

  Scenario: head, last, tail and size of a null list are null
    When executing query:
      """
      RETURN head(null) AS h, last(null) AS l, tail(null) AS t, size(null) AS s
      """
    Then the result should be, in any order:
      | h    | l    | t    | s    |
      | null | null | null | null |
    And no side effects

  Scenario: head, last and tail of an empty list
    When executing query:
      """
      WITH [] AS xs RETURN head(xs) AS h, last(xs) AS l, tail(xs) AS t
      """
    Then the result should be, in any order:
      | h    | l    | t  |
      | null | null | [] |
    And no side effects

  Scenario: Comprehension keeps null elements produced by the projection
    When executing query:
      """
      RETURN [x IN [1, null, 2] | x + 1] AS a,
             [x IN [1, null, 2] WHERE x > 0] AS b
      """
    Then the result should be, in any order:
      | a            | b      |
      | [2, null, 3] | [1, 2] |
    And no side effects

  # ---- IN three-valued logic -------------------------------------------------

  Scenario: IN against a null list is null
    When executing query:
      """
      RETURN 1 IN null AS a, null IN null AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: IN three-valued results with null elements
    When executing query:
      """
      RETURN null IN [1, 2] AS a, null IN [] AS b,
             3 IN [1, null] AS c, 1 IN [1, null] AS d
      """
    Then the result should be, in any order:
      | a    | b     | c    | d    |
      | null | false | null | true |
    And no side effects

  # ---- range() edges -----------------------------------------------------------

  Scenario: range moving away from the stop is empty
    When executing query:
      """
      RETURN range(5, 1) AS a, range(1, 5, -1) AS b, range(3, 3) AS c
      """
    Then the result should be, in any order:
      | a  | b  | c   |
      | [] | [] | [3] |
    And no side effects

  Scenario: range with step zero is an error
    When executing query:
      """
      RETURN range(1, 5, 0) AS a
      """
    Then a SyntaxError should be raised at compile time: NumberOutOfRange

  # ---- aggregates over all-null / empty inputs ----------------------------------

  Scenario: Aggregates over a property that is always null
    When executing query:
      """
      MATCH (n:N {name: 'b'})
      RETURN count(n.v) AS c, sum(n.v) AS s, min(n.v) AS mn,
             max(n.v) AS mx, avg(n.v) AS a, collect(n.v) AS xs
      """
    Then the result should be, in any order:
      | c | s | mn   | mx   | a    | xs |
      | 0 | 0 | null | null | null | [] |
    And no side effects

  Scenario: Aggregates skip null values among real ones
    When executing query:
      """
      MATCH (n:N)
      RETURN count(n.v) AS c, count(*) AS star, sum(n.v) AS s,
             collect(n.v) AS xs, avg(n.v) AS a
      """
    Then the result should be, in any order:
      | c | star | s | xs  | a   |
      | 1 | 2    | 1 | [1] | 1.0 |
    And no side effects

  Scenario: stDev of a single value is zero and of no values is null
    When executing query:
      """
      MATCH (n:N)
      RETURN stDev(n.v) AS one, stDevP(n.v) AS onep
      """
    Then the result should be, in any order:
      | one | onep |
      | 0.0 | 0.0  |
    And no side effects

  Scenario: percentileCont over only-null input is null
    When executing query:
      """
      MATCH (n:N {name: 'b'})
      RETURN percentileCont(n.v, 0.5) AS p, percentileDisc(n.v, 0.5) AS d
      """
    Then the result should be, in any order:
      | p    | d    |
      | null | null |
    And no side effects

  # ---- CASE / coalesce nulls -----------------------------------------------------

  Scenario: Simple CASE does not match null to null
    When executing query:
      """
      RETURN CASE null WHEN null THEN 'eq' ELSE 'ne' END AS a,
             CASE 1 WHEN null THEN 'eq' ELSE 'ne' END AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | 'ne' | 'ne' |
    And no side effects

  Scenario: Searched CASE treats a null predicate as false
    When executing query:
      """
      RETURN CASE WHEN null THEN 'yes' ELSE 'no' END AS a,
             CASE WHEN null = 1 THEN 'yes' ELSE 'no' END AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | 'no' | 'no' |
    And no side effects

  Scenario: coalesce returns the first non-null and null when exhausted
    When executing query:
      """
      RETURN coalesce(null, null, 7) AS a, coalesce(null, null) AS b
      """
    Then the result should be, in any order:
      | a | b    |
      | 7 | null |
    And no side effects

  # ---- boolean three-valued logic ----------------------------------------------

  Scenario: XOR with null operands is null
    When executing query:
      """
      RETURN true XOR null AS a, false XOR null AS b, null XOR null AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | null | null |
    And no side effects

  Scenario: AND and OR short-circuit around null correctly
    When executing query:
      """
      RETURN (false AND null) AS a, (true AND null) AS b,
             (true OR null) AS c, (false OR null) AS d, (NOT null) AS e
      """
    Then the result should be, in any order:
      | a     | b    | c    | d    | e    |
      | false | null | true | null | null |
    And no side effects

  Scenario: Comparisons with null are null, including null = null
    When executing query:
      """
      RETURN null = null AS a, null <> null AS b, null < 1 AS c,
             1 >= null AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |
    And no side effects

  Scenario: IS NULL and IS NOT NULL are never null
    When executing query:
      """
      RETURN null IS NULL AS a, null IS NOT NULL AS b,
             1 IS NULL AS c, 1 IS NOT NULL AS d
      """
    Then the result should be, in any order:
      | a    | b     | c     | d    |
      | true | false | false | true |
    And no side effects
