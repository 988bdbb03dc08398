Feature: VarLength4

  # Var-length edge cases beyond varlength2/varlength_details: property
  # predicates on every traversed relationship, exact-length *n..n forms,
  # zero-length against labels, relationship-id list semantics, and
  # interaction with DISTINCT / aggregation.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:V {name: 'a'})-[:L {ok: true}]->(b:V {name: 'b'}),
             (b)-[:L {ok: true}]->(c:V {name: 'c'}),
             (c)-[:L {ok: false}]->(d:V {name: 'd'}),
             (a)-[:L {ok: true}]->(c),
             (x:W {name: 'x'})-[:R]->(y:W {name: 'y'}),
             (y)-[:R]->(x)
      """

  Scenario: Relationship property predicate applies to every hop
    When executing query:
      """
      MATCH (a:V {name: 'a'})-[rs:L* 1..3 {ok: true}]->(t)
      RETURN t.name AS t, size(rs) AS n
      """
    Then the result should be, in any order:
      | t   | n |
      | 'b' | 1 |
      | 'c' | 2 |
      | 'c' | 1 |
    And no side effects

  Scenario: Exact length form *2..2
    When executing query:
      """
      MATCH (a:V {name: 'a'})-[rs:L*2..2]->(t)
      RETURN t.name AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Zero-length expansion respects the target label
    When executing query:
      """
      MATCH (a:V {name: 'b'})-[:L*0..1]->(t:V)
      RETURN t.name AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
    And no side effects

  Scenario: Relationship uniqueness stops cyclic re-traversal
    When executing query:
      """
      MATCH (x:W {name: 'x'})-[rs:R*1..4]->(x)
      RETURN size(rs) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And no side effects

  Scenario: Undirected var-length on a cycle cannot bounce on one edge
    When executing query:
      """
      MATCH (x:W {name: 'x'})-[rs:R*2..2]-(t)
      RETURN t.name AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'x' |
      | 'x' |
    And no side effects

  Scenario: DISTINCT endpoints of a var-length expansion
    When executing query:
      """
      MATCH (a:V {name: 'a'})-[:L*1..3]->(t)
      RETURN DISTINCT t.name AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
      | 'd' |
    And no side effects

  Scenario: Aggregating over path lengths
    When executing query:
      """
      MATCH (a:V {name: 'a'})-[rs:L*1..3]->(t)
      RETURN size(rs) AS n, count(*) AS c
      """
    Then the result should be, in any order:
      | n | c |
      | 1 | 2 |
      | 2 | 2 |
      | 3 | 1 |
    And no side effects

  Scenario: Undirected var-length from a middle node
    When executing query:
      """
      MATCH (c:V {name: 'c'})-[rs:L*1..1]-(t)
      RETURN t.name AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'a' |
      | 'b' |
      | 'd' |
    And no side effects
