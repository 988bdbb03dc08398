Feature: ExpandInto3

  # ExpandInto acceptance-family mirror (reference:
  # ExpandAcceptance/morpheus acceptance suites): expansion where BOTH
  # endpoints are already bound — re-matching between bound nodes,
  # bound-relationship reuse, self-loops into a bound node, undirected
  # into, and label re-checks on bound variables.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'}),
             (b:P {name: 'b'}),
             (c:Q {name: 'c'}),
             (a)-[:T {w: 1}]->(b),
             (a)-[:T {w: 2}]->(b),
             (a)-[:U {w: 3}]->(b),
             (b)-[:T {w: 4}]->(c),
             (a)-[:T {w: 5}]->(a)
      """

  Scenario: Expand into two bound endpoints finds all parallel edges
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (b:P {name: 'b'})
      MATCH (a)-[r]->(b)
      RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 1 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Expand into with a type filter
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (b:P {name: 'b'})
      MATCH (a)-[r:T]->(b)
      RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Undirected expand into bound endpoints
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (b:P {name: 'b'})
      MATCH (a)-[r:T]-(b)
      RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Self-loop expand into the same bound variable
    When executing query:
      """
      MATCH (a:P {name: 'a'})
      MATCH (a)-[r]->(a)
      RETURN r.w AS w
      """
    Then the result should be, in any order:
      | w |
      | 5 |
    And no side effects

  Scenario: A bound relationship constrains a second pattern
    When executing query:
      """
      MATCH ()-[r:T {w: 1}]->()
      MATCH (x)-[r]->(y)
      RETURN x.name AS x, y.name AS y
      """
    Then the result should be, in any order:
      | x   | y   |
      | 'a' | 'b' |
    And no side effects

  Scenario: A bound relationship with a contradictory type is empty
    When executing query:
      """
      MATCH ()-[r:T {w: 1}]->()
      MATCH (x)-[r:U]->(y)
      RETURN x.name AS x
      """
    Then the result should be, in any order:
      | x |
    And no side effects

  Scenario: Label re-check on a bound node filters rows
    When executing query:
      """
      MATCH (a)-[:T]->(b)
      MATCH (b:Q)
      RETURN b.name AS b
      """
    Then the result should be, in any order:
      | b   |
      | 'c' |
    And no side effects

  Scenario: Var-length expand into a bound target
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (c:Q)
      MATCH (a)-[rs:T*1..3]->(c)
      RETURN size(rs) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
      | 2 |
      | 3 |
      | 3 |
    And no side effects

  Scenario: Expand into inside EXISTS
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (b:P {name: 'b'})
      WHERE EXISTS { (a)-[:U]->(b) }
      RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 'a' | 'b' |
    And no side effects

  Scenario: OPTIONAL expand into bound endpoints keeps unmatched pairs
    When executing query:
      """
      MATCH (a:P {name: 'a'}), (c:Q {name: 'c'})
      OPTIONAL MATCH (a)-[r:T]->(c)
      RETURN a.name AS a, c.name AS c, r.w AS w
      """
    Then the result should be, in any order:
      | a   | c   | w    |
      | 'a' | 'c' | null |
    And no side effects
