Feature: OptionalMatch3

  # Chained and correlated OPTIONAL MATCH edge cases beyond
  # optional_match2: consecutive optionals building on each other's
  # (possibly null) bindings, optional var-length, optional against a
  # value variable from the driving table, and WHERE inside vs after.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'a1'})-[:R]->(b:B {name: 'b1'})-[:R]->(c:C {name: 'c1'}),
             (:A {name: 'a2'})-[:R]->(:B {name: 'b2'}),
             (:A {name: 'a3'})
      """

  Scenario: Chained optionals propagate nulls without dropping rows
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      OPTIONAL MATCH (b)-[:R]->(c:C)
      RETURN a.name AS a, b.name AS b, c.name AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | 'a1' | 'b1' | 'c1' |
      | 'a2' | 'b2' | null |
      | 'a3' | null | null |
    And no side effects

  Scenario: WHERE inside the optional filters the match, not the row
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B) WHERE b.name = 'b1'
      RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | 'a1' | 'b1' |
      | 'a2' | null |
      | 'a3' | null |
    And no side effects

  Scenario: WHERE after the optional filters the row
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      WITH a, b WHERE b.name = 'b1'
      RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | 'a1' | 'b1' |
    And no side effects

  Scenario: Optional var-length expansion
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[rs:R*2..2]->(t)
      RETURN a.name AS a, t.name AS t
      """
    Then the result should be, in any order:
      | a    | t    |
      | 'a1' | 'c1' |
      | 'a2' | null |
      | 'a3' | null |
    And no side effects

  Scenario: Optional match keyed by a list-driven value
    When executing query:
      """
      UNWIND ['b1', 'nope'] AS want
      OPTIONAL MATCH (b:B {name: want})-[:R]->(c)
      RETURN want, c.name AS c
      """
    Then the result should be, in any order:
      | want   | c    |
      | 'b1'   | 'c1' |
      | 'nope' | null |
    And no side effects

  Scenario: Aggregation over an optional binding counts non-nulls only
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN count(b) AS with_b, count(*) AS total
      """
    Then the result should be, in any order:
      | with_b | total |
      | 2      | 3     |
    And no side effects

  Scenario: Properties of a null binding are null in expressions
    When executing query:
      """
      MATCH (a:A {name: 'a3'})
      OPTIONAL MATCH (a)-[:R]->(b:B)
      RETURN a.name AS a, b.name IS NULL AS noname, labels(b) AS lbls
      """
    Then the result should be, in any order:
      | a    | noname | lbls |
      | 'a3' | true   | null |
    And no side effects

  Scenario: Two independent optionals on the same row
    When executing query:
      """
      MATCH (a:A {name: 'a1'})
      OPTIONAL MATCH (a)-[:R]->(b:B {name: 'b1'})
      OPTIONAL MATCH (a)-[:R]->(x:B {name: 'nope'})
      RETURN a.name AS a, b.name AS b, x.name AS x
      """
    Then the result should be, in any order:
      | a    | b    | x    |
      | 'a1' | 'b1' | null |
    And no side effects
