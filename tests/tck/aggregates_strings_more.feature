Feature: AggregatesStringsMore

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:W {name: 'pear', n: 3}), (:W {name: 'apple', n: 1}),
             (:W {name: 'mango', n: 2}), (:Z {name: 'zed'})
      """

  Scenario: min and max over strings are lexicographic
    When executing query:
      """
      MATCH (w:W) RETURN min(w.name) AS lo, max(w.name) AS hi
      """
    Then the result should be, in any order:
      | lo      | hi     |
      | 'apple' | 'pear' |
    And no side effects

  Scenario: Aggregates over an empty match
    When executing query:
      """
      MATCH (m:Missing) RETURN count(m) AS c, sum(m.n) AS s, min(m.n) AS lo
      """
    Then the result should be, in any order:
      | c | s | lo   |
      | 0 | 0 | null |
    And no side effects

  Scenario: toString of float, boolean and integer
    When executing query:
      """
      RETURN toString(3.0) AS f, toString(true) AS b, toString(7) AS i
      """
    Then the result should be, in any order:
      | f     | b      | i   |
      | '3.0' | 'true' | '7' |
    And no side effects

  Scenario: replace and reverse on strings
    When executing query:
      """
      RETURN replace('banana', 'a', 'o') AS r, reverse('spark') AS v
      """
    Then the result should be, in any order:
      | r        | v       |
      | 'bonono' | 'kraps' |
    And no side effects

  Scenario: Multi-key ORDER BY with mixed directions
    When executing query:
      """
      MATCH (w:W) RETURN w.n % 2 AS parity, w.name AS name
      ORDER BY parity ASC, name DESC
      """
    Then the result should be, in order:
      | parity | name    |
      | 0      | 'mango' |
      | 1      | 'pear'  |
      | 1      | 'apple' |
    And no side effects

  Scenario: head and last of an empty list are null
    When executing query:
      """
      WITH [] AS l RETURN head(l) AS h, last(l) AS t, size(l) AS s
      """
    Then the result should be, in any order:
      | h    | t    | s |
      | null | null | 0 |
    And no side effects

  Scenario: Aggregate alias filtered in a later WHERE acts as HAVING
    When executing query:
      """
      MATCH (w:W) WITH w.n % 2 AS parity, count(*) AS c
      WHERE c > 1 RETURN parity, c
      """
    Then the result should be, in any order:
      | parity | c |
      | 1      | 2 |
    And no side effects

  Scenario: collect of a constant per row
    When executing query:
      """
      MATCH (w:W) RETURN size(collect(1)) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |
    And no side effects

  Scenario: stDev of a known sample
    When executing query:
      """
      UNWIND [2, 4, 4, 4, 5, 5, 7, 9] AS x
      RETURN stDevP(x) AS sp
      """
    Then the result should be, in any order:
      | sp  |
      | 2.0 |
    And no side effects
