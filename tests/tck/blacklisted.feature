Feature: Blacklisted

  # Scenarios for features the engine (like the reference) does NOT support.
  # Each name below must appear in BLACKLIST and must keep failing — if one
  # starts passing, the blacklist (and COVERAGE.md) must be updated.

  Scenario: shortestPath is unsupported
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:R]->(:B)
      """
    When executing query:
      """
      MATCH p = shortestPath((:A)-[*]->(:B)) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 1 |
    And no side effects
