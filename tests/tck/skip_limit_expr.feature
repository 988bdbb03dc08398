Feature: SkipLimitExpr

  # SKIP/LIMIT amounts as constant expressions (literals, parameters,
  # arithmetic over them) — the reference blacklists the whole
  # SkipLimitAcceptance expression family; the planner folds these at
  # plan time (planner._int_value) with Cypher truncating division.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N {v: 3}),
             (:N {v: 4}), (:N {v: 5}), (:N {v: 6})
      """

  Scenario: Arithmetic LIMIT
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v ORDER BY v LIMIT 1 + 2
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Arithmetic SKIP with multiplication
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v ORDER BY v SKIP 2 * 2
      """
    Then the result should be, in order:
      | v |
      | 5 |
      | 6 |
    And no side effects

  Scenario: Parameterized SKIP and LIMIT combined
    And parameters are:
      | s | 1 |
      | l | 2 |
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v ORDER BY v SKIP $s LIMIT $l
      """
    Then the result should be, in order:
      | v |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Truncating division in a LIMIT expression
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v ORDER BY v LIMIT 7 / 2
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Parameter arithmetic in SKIP
    And parameters are:
      | page | 2 |
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v ORDER BY v SKIP ($page - 1) * 3 LIMIT 3
      """
    Then the result should be, in order:
      | v |
      | 4 |
      | 5 |
      | 6 |
    And no side effects

  Scenario: SKIP beyond the row count yields no rows
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v ORDER BY v SKIP 5 + 5
      """
    Then the result should be, in order:
      | v |
    And no side effects

  Scenario: LIMIT 0 yields no rows
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v LIMIT 0
      """
    Then the result should be, in any order:
      | v |
    And no side effects

  Scenario: Division by zero in LIMIT is a clean error
    When executing query:
      """
      MATCH (n:N) RETURN n.v AS v LIMIT 1 / 0
      """
    Then a SyntaxError should be raised

  Scenario: WITH-level SKIP and LIMIT paginate the intermediate rows
    When executing query:
      """
      MATCH (n:N)
      WITH n.v AS v ORDER BY v SKIP 1 LIMIT 2 + 2
      RETURN sum(v) AS s
      """
    Then the result should be, in any order:
      | s  |
      | 14 |
    And no side effects
