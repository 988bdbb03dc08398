Feature: FunctionsEdgeCases

  # Scalar/function edge semantics verified against Neo4j behavior:
  # arithmetic sign rules, string builtins on out-of-range arguments,
  # conversion failure modes, quantifiers over empty lists and null
  # predicates, null propagation through string operators, and map
  # equality with nulls.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {name: 'a', age: 5}), (:N {name: 'b'}), (:N {name: 'c', age: 7})
      """

  Scenario: Modulo keeps the dividend sign and caret is float power
    When executing query:
      """
      RETURN 5 % -3 AS a, -5 % 3 AS b, 2 ^ 10 AS c, 7 / 2 AS d, 7.0 / 2 AS e
      """
    Then the result should be, in any order:
      | a | b  | c      | d | e   |
      | 2 | -2 | 1024.0 | 3 | 3.5 |
    And no side effects

  Scenario: Integer division truncates toward zero
    When executing query:
      """
      RETURN -7 / 2 AS a, 7 / -2 AS b
      """
    Then the result should be, in any order:
      | a  | b  |
      | -3 | -3 |
    And no side effects

  Scenario: substring and left beyond the string length
    When executing query:
      """
      RETURN substring('hello', 10) AS a, left('ab', 5) AS b, right('ab', 5) AS c
      """
    Then the result should be, in any order:
      | a  | b    | c    |
      | '' | 'ab' | 'ab' |
    And no side effects

  Scenario: split preserves empty segments
    When executing query:
      """
      RETURN split('a,b,,c', ',') AS x
      """
    Then the result should be, in any order:
      | x                   |
      | ['a', 'b', '', 'c'] |
    And no side effects

  Scenario: toInteger truncates decimals and nulls on garbage
    When executing query:
      """
      RETURN toInteger('12.9') AS a, toInteger('abc') AS b, toFloat('1e3') AS c
      """
    Then the result should be, in any order:
      | a  | b    | c      |
      | 12 | null | 1000.0 |
    And no side effects

  Scenario: String concatenation coerces the non-string side
    When executing query:
      """
      RETURN 'abc' + 1 AS a, toString(1.5) AS b, toString(true) AS c
      """
    Then the result should be, in any order:
      | a      | b     | c      |
      | 'abc1' | '1.5' | 'true' |
    And no side effects

  Scenario: String predicates propagate null operands
    When executing query:
      """
      RETURN 'abc' STARTS WITH null AS a, null CONTAINS 'a' AS b,
             null ENDS WITH 'x' AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | null | null |
    And no side effects

  Scenario: Quantifiers over the empty list
    When executing query:
      """
      RETURN all(x IN [] WHERE x > 0) AS a, any(x IN [] WHERE x > 0) AS b,
             none(x IN [] WHERE x > 0) AS c, single(x IN [] WHERE x > 0) AS d
      """
    Then the result should be, in any order:
      | a    | b     | c    | d     |
      | true | false | true | false |
    And no side effects

  Scenario: single is true for exactly one satisfying element
    When executing query:
      """
      RETURN single(x IN [1,2] WHERE x > 1) AS a, single(x IN [2,3] WHERE x > 1) AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |
    And no side effects

  Scenario: Quantifier with a null predicate is null
    When executing query:
      """
      RETURN none(x IN [1] WHERE x > null) AS x
      """
    Then the result should be, in any order:
      | x    |
      | null |
    And no side effects

  Scenario: List and map equality with nulls is ternary
    When executing query:
      """
      RETURN [1,null] = [1,null] AS a, [1] = [1,2] AS b, [1,2] = [1,null] AS c,
             {a: 1} = {a: 1} AS d, {a: null} = {a: null} AS e
      """
    Then the result should be, in any order:
      | a    | b     | c    | d    | e    |
      | null | false | null | true | null |
    And no side effects

  Scenario: Aggregates skip null property values
    When executing query:
      """
      MATCH (n:N)
      RETURN count(*) AS rows, count(n.age) AS vals, avg(n.age) AS av,
             collect(n.age) AS c
      """
    Then the result should be, in any order:
      | rows | vals | av  | c      |
      | 3    | 2    | 6.0 | [5, 7] |
    And no side effects

  Scenario: Sample standard deviation of a single value is zero
    # Neo4j returns 0.0 for stDev of one value (Spark's stddev_samp is
    # null there — the compiler coalesces behind a count gate, round 7)
    When executing query:
      """
      MATCH (n:N {name: 'a'})
      RETURN stDev(n.age) AS s, stDevP(n.age) AS p
      """
    Then the result should be, in any order:
      | s   | p   |
      | 0.0 | 0.0 |
    And no side effects

  Scenario: Nested UNWIND flattens in order
    When executing query:
      """
      UNWIND [[1,2],[3]] AS x
      UNWIND x AS y
      RETURN collect(y) AS c
      """
    Then the result should be, in any order:
      | c         |
      | [1, 2, 3] |
    And no side effects

  Scenario: UNWIND of null or empty produces no rows
    When executing query:
      """
      UNWIND [1] AS keep
      OPTIONAL MATCH (zzz:Nope)
      WITH keep, zzz
      UNWIND [] AS x
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 0 |
    And no side effects

  Scenario: Map projection pulls named properties
    When executing query:
      """
      MATCH (n:N {name: 'a'})
      WITH n {.name, .age} AS m
      RETURN m.name AS name, m.age AS age
      """
    Then the result should be, in any order:
      | name | age |
      | 'a'  | 5   |
    And no side effects

  Scenario: keys of a node are sorted, keys of a map literal keep order
    When executing query:
      """
      MATCH (n:N {name: 'a'})
      RETURN keys(n) AS nk, keys({b: 1, a: 2}) AS mk
      """
    Then the result should be, in any order:
      | nk              | mk         |
      | ['age', 'name'] | ['b', 'a'] |
    And no side effects
