Feature: Blacklisted

  # Scenarios for features the engine (like the reference) does NOT support.
  # Each name below must appear in BLACKLIST and must keep failing — if one
  # starts passing, the blacklist (and COVERAGE.md) must be updated.

  # round 7: unbounded shortestPath [*] became SUPPORTED (the previous
  # occupant of this blacklist started passing — promoted to
  # shortest_paths.feature); minimum length above one remains rejected.

  Scenario: shortestPath with minimum length above one is unsupported
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:R]->(:B)-[:R]->(:C)
      """
    When executing query:
      """
      MATCH p = shortestPath((:A)-[*2..3]->(:C)) RETURN length(p) AS l
      """
    Then the result should be, in any order:
      | l |
      | 2 |
    And no side effects
