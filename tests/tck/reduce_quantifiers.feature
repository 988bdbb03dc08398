Feature: ReduceQuantifiers

  # reduce() folds and the all/any/none list quantifiers — ternary-logic
  # edge cases included (null elements make quantifiers null when
  # undecided, per openCypher).

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {xs: [1, 2, 3, 4], name: 'n1'}),
             (:N {xs: [], name: 'n2'})
      """

  Scenario: Reduce sums a literal list
    When executing query:
      """
      RETURN reduce(acc = 0, x IN [1, 2, 3, 4] | acc + x) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 10 |
    And no side effects

  Scenario: Reduce over an empty list returns the seed
    When executing query:
      """
      RETURN reduce(acc = 42, x IN [] | acc + x) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 42 |
    And no side effects

  Scenario: Reduce builds a string left to right
    When executing query:
      """
      RETURN reduce(acc = '', w IN ['a', 'b', 'c'] | acc + w) AS s
      """
    Then the result should be, in any order:
      | s     |
      | 'abc' |
    And no side effects

  Scenario: Reduce over a stored property list
    When executing query:
      """
      MATCH (n:N)
      RETURN n.name AS name, reduce(acc = 1, x IN n.xs | acc * x) AS p
      """
    Then the result should be, in any order:
      | name | p  |
      | 'n1' | 24 |
      | 'n2' | 1  |
    And no side effects

  Scenario: Reduce with range produces triangular numbers
    When executing query:
      """
      UNWIND [3, 5] AS n
      RETURN n AS n, reduce(acc = 0, x IN range(1, n) | acc + x) AS t
      """
    Then the result should be, in any order:
      | n | t  |
      | 3 | 6  |
      | 5 | 15 |
    And no side effects

  Scenario: All quantifier true and false cases
    When executing query:
      """
      RETURN all(x IN [1, 2, 3] WHERE x > 0) AS a,
             all(x IN [1, 2, 3] WHERE x > 1) AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |
    And no side effects

  Scenario: Any quantifier true and false cases
    When executing query:
      """
      RETURN any(x IN [1, 2, 3] WHERE x = 2) AS a,
             any(x IN [1, 2, 3] WHERE x = 9) AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |
    And no side effects

  Scenario: None quantifier true and false cases
    When executing query:
      """
      RETURN none(x IN [1, 2, 3] WHERE x = 9) AS a,
             none(x IN [1, 2, 3] WHERE x = 2) AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |
    And no side effects

  Scenario: Quantifiers over an empty list
    When executing query:
      """
      RETURN all(x IN [] WHERE x > 0) AS a,
             any(x IN [] WHERE x > 0) AS b,
             none(x IN [] WHERE x > 0) AS c
      """
    Then the result should be, in any order:
      | a    | b     | c    |
      | true | false | true |
    And no side effects

  Scenario: Quantifier as a WHERE predicate
    When executing query:
      """
      MATCH (n:N)
      WHERE all(x IN n.xs WHERE x < 10)
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'n1' |
      | 'n2' |
    And no side effects

  Scenario: Any over split string
    When executing query:
      """
      RETURN any(w IN split('the quick fox', ' ') WHERE w = 'quick') AS hit
      """
    Then the result should be, in any order:
      | hit  |
      | true |
    And no side effects

  Scenario: Reduce nested inside a list comprehension
    When executing query:
      """
      RETURN [n IN [2, 3] | reduce(acc = 0, x IN range(1, n) | acc + x)] AS ts
      """
    Then the result should be, in any order:
      | ts     |
      | [3, 6] |
    And no side effects

  Scenario: Single quantifier true, false-by-none, false-by-many
    When executing query:
      """
      RETURN single(x IN [1, 2, 3] WHERE x = 2) AS a,
             single(x IN [1, 2, 3] WHERE x = 9) AS b,
             single(x IN [1, 2, 3] WHERE x > 1) AS c
      """
    Then the result should be, in any order:
      | a    | b     | c     |
      | true | false | false |
    And no side effects

  Scenario: Single quantifier as a WHERE predicate
    When executing query:
      """
      MATCH (n:N)
      WHERE single(x IN n.xs WHERE x = 3)
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'n1' |
    And no side effects
