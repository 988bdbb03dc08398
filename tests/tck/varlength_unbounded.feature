Feature: VarLengthUnbounded

  # Unbounded var-length expand [*] / [*n..] (round 7, BEYOND reference
  # parity — the reference blacklists the whole family,
  # morpheus-tck failing_blacklist:3-7). Relationship-isomorphism (trail)
  # semantics: no relationship repeats within one path, so the fixpoint
  # drains on any finite graph, cycles included.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})-[:T]->(c:P {name: 'c'})-[:T]->(d:P {name: 'd'}),
             (e:P {name: 'e'})-[:T]->(f:P {name: 'f'})-[:T]->(e)
      """

  Scenario: Unbounded star reaches the whole chain
    When executing query:
      """
      MATCH (a:P {name: 'a'})-[*]->(b) RETURN b.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Lower bound with unbounded upper
    When executing query:
      """
      MATCH (a:P {name: 'a'})-[*2..]->(b) RETURN b.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Zero lower bound includes the start node
    When executing query:
      """
      MATCH (a:P {name: 'a'})-[*0..]->(b) RETURN b.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Unbounded expand terminates on a cycle via relationship isomorphism
    When executing query:
      """
      MATCH (s:P {name: 'e'})-[*]->(b) RETURN b.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'f' |
      | 'e' |
    And no side effects

  Scenario: Unbounded undirected expand
    When executing query:
      """
      MATCH (s:P {name: 'c'})-[*]-(b) RETURN DISTINCT b.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |
      | 'b' |
      | 'd' |
    And no side effects

  Scenario: Relationship list variable binds across an unbounded expand
    When executing query:
      """
      MATCH (a:P {name: 'a'})-[r*]->(b:P {name: 'd'}) RETURN size(r) AS len
      """
    Then the result should be, in any order:
      | len |
      | 3   |
    And no side effects

  Scenario: Unbounded expand whose walks drain below the lower bound is empty
    When executing query:
      """
      MATCH (a:P {name: 'a'})-[*5..]->(b) RETURN b.name AS n
      """
    Then the result should be, in any order:
      | n |
    And no side effects

  Scenario: Typed unbounded expand with aggregation
    When executing query:
      """
      MATCH (a:P {name: 'a'})-[:T*]->(b) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |
    And no side effects
