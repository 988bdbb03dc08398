Feature: Errors

  Scenario: Unbounded variable-length match finds the chain
    # unbounded [*] is supported since round 7 (fixpoint expand) — this
    # scenario used to pin the rejection; see varlength_unbounded.feature
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})-[:R]->(:A {k: 2})
      """
    When executing query:
      """
      MATCH (a:A)-[:R*]->(b) RETURN b.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 2 |
    And no side effects
    And no side effects

  Scenario: Unbound variable in RETURN
    Given an empty graph
    When executing query:
      """
      MATCH (a) RETURN b.name AS name
      """
    Then a SyntaxError should be raised
    And no side effects

  Scenario: Malformed query text
    Given an empty graph
    When executing query:
      """
      MATCH (a RETURN a
      """
    Then a SyntaxError should be raised
    And no side effects

  Scenario: SKIP with division by zero in constant expression
    When executing query:
      """
      MATCH (n) RETURN n.name AS name SKIP 1 / 0
      """
    Then a SyntaxError should be raised
    And no side effects

  Scenario: LIMIT with modulo by zero in constant expression
    When executing query:
      """
      MATCH (n) RETURN n.name AS name LIMIT 3 % 0
      """
    Then a SyntaxError should be raised
    And no side effects
