Feature: OptionalVarLength

  # OPTIONAL MATCH interacting with var-length relationships: null
  # bindings on zero matches, the relationship LIST variable (size,
  # IS NULL), zero-length lower bounds binding both endpoints to the
  # same node, exact-length windows, WHERE inside the optional scope,
  # and aggregation over the padded rows.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'})-[:T]->(c:P {name: 'c'}),
             (:P {name: 'd'})
      """

  Scenario: Zero-match var-length pads null endpoint and null list
    When executing query:
      """
      MATCH (p:P {name: 'd'})
      OPTIONAL MATCH (p)-[r:T*1..2]->(q)
      RETURN p.name AS n, q.name AS qn, r IS NULL AS rnull
      """
    Then the result should be, in any order:
      | n   | qn   | rnull |
      | 'd' | null | true  |
    And no side effects

  Scenario: Matched var-length binds the relationship list with its length
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      OPTIONAL MATCH (p)-[r:T*1..2]->(q)
      RETURN q.name AS qn, size(r) AS hops
      """
    Then the result should be, in any order:
      | qn  | hops |
      | 'b' | 1    |
      | 'c' | 2    |
    And no side effects

  Scenario: Zero lower bound binds the start node itself
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[r:T*0..1]->(q)
      RETURN p.name AS n, q.name AS qn
      """
    Then the result should be, in any order:
      | n   | qn  |
      | 'a' | 'a' |
      | 'a' | 'b' |
      | 'b' | 'b' |
      | 'b' | 'c' |
      | 'c' | 'c' |
      | 'd' | 'd' |
    And no side effects

  Scenario: Zero-length match yields an empty relationship list
    When executing query:
      """
      MATCH (p:P {name: 'd'})
      OPTIONAL MATCH (p)-[r:T*0..1]->(q)
      RETURN q.name AS qn, size(r) AS k
      """
    Then the result should be, in any order:
      | qn  | k |
      | 'd' | 0 |
    And no side effects

  Scenario: Exact-length window matches only full-length paths
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[r:T*2..2]->(q)
      RETURN p.name AS n, q.name AS qn, size(r) AS k
      """
    Then the result should be, in any order:
      | n   | qn   | k    |
      | 'a' | 'c'  | 2    |
      | 'b' | null | null |
      | 'c' | null | null |
      | 'd' | null | null |
    And no side effects

  Scenario: WHERE inside the optional scope filters matches, not rows
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      OPTIONAL MATCH (p)-[r:T*1..2]->(q) WHERE q.name = 'z'
      RETURN p.name AS n, q.name AS qn, count(*) AS c
      """
    Then the result should be, in any order:
      | n   | qn   | c |
      | 'a' | null | 1 |
    And no side effects

  Scenario: WHERE inside the optional scope keeps satisfying matches only
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      OPTIONAL MATCH (p)-[r:T*1..2]->(q) WHERE q.name = 'c'
      RETURN q.name AS qn, size(r) AS k
      """
    Then the result should be, in any order:
      | qn  | k |
      | 'c' | 2 |
    And no side effects

  Scenario: Aggregating over padded rows counts nulls correctly
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[r:T*1..2]->(q)
      RETURN count(*) AS rows, count(q) AS matched
      """
    Then the result should be, in any order:
      | rows | matched |
      | 5    | 3       |
    And no side effects

  Scenario: Undirected optional var-length from an isolated node
    When executing query:
      """
      MATCH (p:P {name: 'd'})
      OPTIONAL MATCH (p)-[r:T*1..3]-(q)
      RETURN q.name AS qn
      """
    Then the result should be, in any order:
      | qn   |
      | null |
    And no side effects

  Scenario: Undirected var-length reaches both directions
    When executing query:
      """
      MATCH (p:P {name: 'b'})
      OPTIONAL MATCH (p)-[r:T*1..1]-(q)
      RETURN q.name AS qn, size(r) AS k
      """
    Then the result should be, in any order:
      | qn  | k |
      | 'a' | 1 |
      | 'c' | 1 |
    And no side effects

  Scenario: Var-length list participates in list predicates after padding
    When executing query:
      """
      MATCH (p:P)
      OPTIONAL MATCH (p)-[r:T*1..2]->(q)
      WITH p, q, r WHERE r IS NULL OR size(r) = 2
      RETURN p.name AS n, q.name AS qn
      """
    Then the result should be, in any order:
      | n   | qn   |
      | 'a' | 'c'  |
      | 'c' | null |
      | 'd' | null |
    And no side effects

  Scenario: Two optional var-length matches stack independently
    When executing query:
      """
      MATCH (p:P {name: 'b'})
      OPTIONAL MATCH (p)-[r1:T*1..2]->(x)
      OPTIONAL MATCH (p)<-[r2:T*2..2]-(y)
      RETURN x.name AS xn, y.name AS yn
      """
    Then the result should be, in any order:
      | xn  | yn   |
      | 'c' | null |
    And no side effects

  Scenario: Optional var-length into an already-bound endpoint
    When executing query:
      """
      MATCH (p:P {name: 'a'}), (q:P {name: 'c'})
      OPTIONAL MATCH (p)-[r:T*1..3]->(q)
      RETURN q.name AS qn, size(r) AS k
      """
    Then the result should be, in any order:
      | qn  | k |
      | 'c' | 2 |
    And no side effects

  Scenario: Optional var-length into a bound endpoint with no path
    When executing query:
      """
      MATCH (p:P {name: 'c'}), (q:P {name: 'a'})
      OPTIONAL MATCH (p)-[r:T*1..3]->(q)
      RETURN p.name AS n, q.name AS qn, r IS NULL AS rnull
      """
    Then the result should be, in any order:
      | n   | qn  | rnull |
      | 'c' | 'a' | true  |
    And no side effects
