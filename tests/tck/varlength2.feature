Feature: VarLength2

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (d:P {name: 'd'}),
             (a)-[:R]->(b), (b)-[:R]->(c), (c)-[:R]->(d),
             (a)-[:S]->(c)
      """

  Scenario: Fixed length two
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:R*2]->(y) RETURN y.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'c'  |
    And no side effects

  Scenario: Range one to three
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:R*1..3]->(y) RETURN y.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
      | 'c'  |
      | 'd'  |
    And no side effects

  Scenario: Lower bound two prunes the one-hop
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:R*2..3]->(y) RETURN y.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'c'  |
      | 'd'  |
    And no side effects

  Scenario: Zero-length includes the start node
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:R*0..1]->(y) RETURN y.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'b'  |
    And no side effects

  Scenario: Multiple types in the variable expansion
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[:R|S*1..1]->(y) RETURN y.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
      | 'c'  |
    And no side effects

  Scenario: Reverse direction variable expansion
    When executing query:
      """
      MATCH (x:P {name: 'd'})<-[:R*1..2]-(y) RETURN y.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'c'  |
      | 'b'  |
    And no side effects

  Scenario: Relationship list variable collects the hops
    When executing query:
      """
      MATCH (x:P {name: 'a'})-[rs:R*2..2]->(y)
      RETURN size(rs) AS n, y.name AS name
      """
    Then the result should be, in any order:
      | n | name |
      | 2 | 'c'  |
    And no side effects

  Scenario: Variable expansion respects relationship uniqueness
    Given an empty graph
    And having executed:
      """
      CREATE (a:Q {name: 'a'}), (b:Q {name: 'b'}),
             (a)-[:T]->(b), (b)-[:T]->(a)
      """
    When executing query:
      """
      MATCH (x:Q {name: 'a'})-[:T*3..3]->(y) RETURN y.name AS name
      """
    Then the result should be empty
    And no side effects
