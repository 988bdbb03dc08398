Feature: VarLengthDetails

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a'})-[:R]->(b:N {name: 'b'})-[:R]->(c:N {name: 'c'})-[:R]->(d:N {name: 'd'}),
             (a)-[:S]->(c)
      """

  Scenario: Fixed-bound expansion collects all depths
    When executing query:
      """
      MATCH (a:N {name: 'a'})-[:R*1..2]->(x)
      RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
      | 'c'  |
    And no side effects

  Scenario: Zero-length lower bound includes the start node
    When executing query:
      """
      MATCH (a:N {name: 'a'})-[:R*0..1]->(x)
      RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'b'  |
    And no side effects

  Scenario: Exact-depth expansion
    When executing query:
      """
      MATCH (a:N {name: 'a'})-[:R*3..3]->(x)
      RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'd'  |
    And no side effects

  Scenario: Multiple relationship types in the variable pattern
    When executing query:
      """
      MATCH (a:N {name: 'a'})-[:R|S*1..1]->(x)
      RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
      | 'c'  |
    And no side effects

  Scenario: Undirected variable-length reaches both directions
    When executing query:
      """
      MATCH (b:N {name: 'b'})-[:R*1..1]-(x)
      RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'c'  |
    And no side effects

  Scenario: Relationship uniqueness prevents immediate backtracking
    When executing query:
      """
      MATCH (a:N {name: 'a'})-[:R*2..2]-(x)
      RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'c'  |
    And no side effects

  Scenario: Unbounded upper bound walks the chain to its end
    # supported since round 7 (fixpoint expand, beyond reference parity —
    # see varlength_unbounded.feature for the full family)
    When executing query:
      """
      MATCH (a:N {name: 'a'})-[:R*]->(x) RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
      | 'c'  |
      | 'd'  |
    And no side effects
