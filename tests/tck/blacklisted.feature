Feature: Blacklisted

  # Scenarios for features the engine (like the reference) does NOT support.
  # Each name below must appear in BLACKLIST and must keep failing — if one
  # starts passing, the blacklist (and COVERAGE.md) must be updated.

  # round 7: unbounded shortestPath [*] became SUPPORTED (promoted to
  # shortest_paths.feature). round 8: shortestPath with minimum length
  # above one became SUPPORTED (planner._minlen_shortest_levels; promoted
  # to shortest_paths.feature). The blacklist is now empty — remaining
  # non-features (updates, zoned time, Point) fail with clean error gates
  # covered by tests/test_negative_gate.py.
