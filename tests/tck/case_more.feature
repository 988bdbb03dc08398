Feature: CaseMore

  # CASE expression coverage: simple (operand) and searched forms,
  # null operands, missing ELSE, nesting, CASE inside WHERE / ORDER BY
  # / aggregation.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:E {v: 1, name: 'one'}), (:E {v: 2, name: 'two'}),
             (:E {v: 3, name: 'three'}), (:E {name: 'nothing'})
      """

  Scenario: Simple CASE with operand
    When executing query:
      """
      MATCH (e:E)
      RETURN e.name AS name,
             CASE e.v WHEN 1 THEN 'a' WHEN 2 THEN 'b' ELSE 'z' END AS c
      """
    Then the result should be, in any order:
      | name      | c   |
      | 'one'     | 'a' |
      | 'two'     | 'b' |
      | 'three'   | 'z' |
      | 'nothing' | 'z' |
    And no side effects

  Scenario: Simple CASE without ELSE yields null
    When executing query:
      """
      MATCH (e:E)
      RETURN e.name AS name, CASE e.v WHEN 1 THEN 'a' END AS c
      """
    Then the result should be, in any order:
      | name      | c    |
      | 'one'     | 'a'  |
      | 'two'     | null |
      | 'three'   | null |
      | 'nothing' | null |
    And no side effects

  Scenario: Searched CASE evaluates top-down
    When executing query:
      """
      MATCH (e:E)
      RETURN e.name AS name,
             CASE WHEN e.v >= 3 THEN 'big'
                  WHEN e.v >= 2 THEN 'mid'
                  WHEN e.v IS NULL THEN 'none'
                  ELSE 'small' END AS c
      """
    Then the result should be, in any order:
      | name      | c       |
      | 'one'     | 'small' |
      | 'two'     | 'mid'   |
      | 'three'   | 'big'   |
      | 'nothing' | 'none'  |
    And no side effects

  Scenario: Null operand matches no WHEN branch
    When executing query:
      """
      MATCH (e:E {name: 'nothing'})
      RETURN CASE e.v WHEN 1 THEN 'a' ELSE 'fallback' END AS c
      """
    Then the result should be, in any order:
      | c          |
      | 'fallback' |
    And no side effects

  Scenario: Nested CASE expressions
    When executing query:
      """
      MATCH (e:E)
      WHERE e.v IS NOT NULL
      RETURN e.v AS v,
             CASE WHEN e.v > 1
                  THEN CASE WHEN e.v > 2 THEN 'xl' ELSE 'l' END
                  ELSE 's' END AS size
      """
    Then the result should be, in any order:
      | v | size |
      | 1 | 's'  |
      | 2 | 'l'  |
      | 3 | 'xl' |
    And no side effects

  Scenario: CASE inside WHERE
    When executing query:
      """
      MATCH (e:E)
      WHERE CASE WHEN e.v IS NULL THEN false ELSE e.v % 2 = 1 END
      RETURN e.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'one'   |
      | 'three' |
    And no side effects

  Scenario: CASE drives ORDER BY
    When executing query:
      """
      MATCH (e:E)
      RETURN e.name AS name
      ORDER BY CASE WHEN e.v IS NULL THEN 99 ELSE e.v END, name
      """
    Then the result should be, in order:
      | name      |
      | 'one'     |
      | 'two'     |
      | 'three'   |
      | 'nothing' |
    And no side effects

  Scenario: Aggregating over a CASE bucket
    When executing query:
      """
      MATCH (e:E)
      WITH CASE WHEN e.v IS NULL THEN 'missing' ELSE 'present' END AS bucket
      RETURN bucket AS bucket, count(*) AS n
      """
    Then the result should be, in any order:
      | bucket    | n |
      | 'present' | 3 |
      | 'missing' | 1 |
    And no side effects

  Scenario: CASE result feeds arithmetic
    When executing query:
      """
      MATCH (e:E)
      WHERE e.v IS NOT NULL
      RETURN sum(CASE WHEN e.v > 1 THEN e.v ELSE 0 END) AS s
      """
    Then the result should be, in any order:
      | s |
      | 5 |
    And no side effects

  Scenario: CASE over a list element
    When executing query:
      """
      UNWIND [[1], [], null] AS l
      RETURN CASE WHEN l IS NULL THEN 'null'
                  WHEN size(l) = 0 THEN 'empty'
                  ELSE 'full' END AS kind
      """
    Then the result should be, in any order:
      | kind    |
      | 'full'  |
      | 'empty' |
      | 'null'  |
    And no side effects
