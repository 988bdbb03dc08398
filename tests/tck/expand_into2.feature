Feature: ExpandInto2

  # Bound-endpoint expansion edge cases mirroring the reference's
  # ExpandInto acceptance family (RelationalPlanner.scala:167-189):
  # when both endpoints are already bound, the expand becomes a filter
  # on the relationship frame rather than a widening join.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}), (b:P {name: 'b'}), (c:P {name: 'c'}),
             (a)-[:X {w: 1}]->(b), (a)-[:Y {w: 2}]->(b),
             (b)-[:X {w: 3}]->(c), (c)-[:X {w: 4}]->(a),
             (a)-[:L {w: 5}]->(a)
      """

  Scenario: Two parallel pattern legs between the same bound pair
    When executing query:
      """
      MATCH (a:P {name: 'a'})-[:X]->(b), (a)-[:Y]->(b)
      RETURN b.name AS b
      """
    Then the result should be, in any order:
      | b   |
      | 'b' |
    And no side effects

  Scenario: Triangle pattern binds all three corners
    When executing query:
      """
      MATCH (a)-[:X]->(b)-[:X]->(c)-[:X]->(a)
      RETURN a.name AS a, b.name AS b, c.name AS c
      """
    Then the result should be, in any order:
      | a   | b   | c   |
      | 'a' | 'b' | 'c' |
      | 'b' | 'c' | 'a' |
      | 'c' | 'a' | 'b' |
    And no side effects

  Scenario: Expand into a bound self-loop
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (a)-[r:L]->(a)
      RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 5 |
    And no side effects

  Scenario: Directed expand-into respects direction
    When executing query:
      """
      MATCH (b:P {name: 'b'}), (a:P {name: 'a'}), (b)-[r:X]->(a)
      RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
    And no side effects

  Scenario: Reversed direction between the same bound pair matches
    When executing query:
      """
      MATCH (b:P {name: 'b'}), (a:P {name: 'a'}), (a)-[r:X]->(b)
      RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 1 |
    And no side effects

  Scenario: Undirected expand-into finds either orientation
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (c:P {name: 'c'}), (a)-[r:X]-(c)
      RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 4 |
    And no side effects

  Scenario: Undirected expand-into on a self-loop yields one row
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (a)-[r:L]-(a)
      RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 5 |
    And no side effects

  Scenario: Relationship uniqueness holds across bound-endpoint legs
    When executing query:
      """
      MATCH (a:P {name: 'a'})-[r1]->(b:P {name: 'b'}), (a)-[r2]->(b)
      WHERE r1.w < r2.w
      RETURN r1.w AS w1, r2.w AS w2
      """
    Then the result should be, in any order:
      | w1 | w2 |
      | 1  | 2  |
    And no side effects

  Scenario: Expand into with relationship property predicate
    When executing query:
      """
      MATCH (a:P)-[:X]->(b:P), (b)-[r:X {w: 3}]->(c:P)
      RETURN a.name AS a, c.name AS c
      """
    Then the result should be, in any order:
      | a   | c   |
      | 'a' | 'c' |
    And no side effects

  Scenario: Type-anonymous expand into bound endpoints
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (b:P {name: 'b'}), (a)-[r]->(b)
      RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 1 |
      | 2 |
    And no side effects

  Scenario: OPTIONAL expand into bound endpoints without a match
    When executing query:
      """
      MATCH (b:P {name: 'b'}), (c:P {name: 'c'})
      OPTIONAL MATCH (c)-[r:Y]->(b)
      RETURN c.name AS c, r.w AS w
      """
    Then the result should be, in any order:
      | c   | w    |
      | 'c' | null |
    And no side effects

  Scenario: Bound pair reached through two different join orders agrees
    When executing query:
      """
      MATCH (a)-[:L]->(a)-[:X]->(b)
      RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 'a' | 'b' |
    And no side effects
