Feature: With3

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:E {name: 'a', v: 1}), (:E {name: 'b', v: 2}),
             (:E {name: 'c', v: 3}), (:E {name: 'd', v: 4})
      """

  Scenario: WITH renames and the old name goes out of scope
    When executing query:
      """
      MATCH (e:E) WITH e.v AS w WHERE w > 2 RETURN w ORDER BY w
      """
    Then the result should be, in order:
      | w |
      | 3 |
      | 4 |
    And no side effects

  Scenario: Referring to a projected-away variable is an error
    When executing query:
      """
      MATCH (e:E) WITH e.v AS w RETURN e.name AS name
      """
    Then a SyntaxError should be raised at compile time: UndefinedVariable
    And no side effects

  Scenario: WITH star keeps everything and adds a column
    When executing query:
      """
      MATCH (e:E) WITH *, e.v * 2 AS dbl WHERE dbl = 4
      RETURN e.name AS name, dbl
      """
    Then the result should be, in any order:
      | name | dbl |
      | 'b'  | 4   |
    And no side effects

  Scenario: Consecutive aggregating WITH clauses
    When executing query:
      """
      MATCH (e:E) WITH e.v % 2 AS parity, count(*) AS n
      WITH sum(n) AS total
      RETURN total
      """
    Then the result should be, in any order:
      | total |
      | 4     |
    And no side effects

  Scenario: WITH DISTINCT collapses duplicates early
    When executing query:
      """
      MATCH (e:E) WITH DISTINCT e.v % 2 AS parity
      RETURN parity ORDER BY parity
      """
    Then the result should be, in order:
      | parity |
      | 0      |
      | 1      |
    And no side effects

  Scenario: WITH LIMIT bounds later expansion
    When executing query:
      """
      MATCH (e:E) WITH e ORDER BY e.v LIMIT 2
      RETURN e.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'b'  |
    And no side effects

  Scenario: UNWIND after WITH over a collected list
    When executing query:
      """
      MATCH (e:E) WITH collect(e.v) AS vs
      UNWIND vs AS v RETURN v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |
      | 3 |
      | 4 |
    And no side effects

  Scenario: MATCH after WITH continues the pipeline
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {name: 'a'}), (b:U {name: 'b'}), (a)-[:L]->(b)
      """
    When executing query:
      """
      MATCH (x:U) WITH x WHERE x.name = 'a'
      MATCH (x)-[:L]->(y)
      RETURN y.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
    And no side effects

  Scenario: WHERE between WITHs applies to the projected value
    When executing query:
      """
      MATCH (e:E) WITH e.v AS v WHERE v % 2 = 0
      WITH v WHERE v > 2
      RETURN v
      """
    Then the result should be, in any order:
      | v |
      | 4 |
    And no side effects
