Feature: Errors

  Scenario: Unbounded variable-length match is rejected
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:R]->(:A)
      """
    When executing query:
      """
      MATCH (a:A)-[:R*]->(b) RETURN b
      """
    Then a SyntaxError should be raised
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
