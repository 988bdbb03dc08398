Feature: CallProcedure

  # CALL proc(args) YIELD cols (parser.parse_call_procedure,
  # planner.plan_call_procedure, procedures.py registry) — beyond
  # reference parity: the reference has no procedures
  # (documentation/asciidoc/cypher-cypher9-features.adoc:57-76).
  # Fixture node ids are generated, so assertions go through patterns
  # (id(n) = yielded id) or id-independent aggregates.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'a'})-[:KNOWS {w: 1}]->(b:Person {name: 'b'}),
             (b)-[:KNOWS {w: 2}]->(c:Person {name: 'c'}),
             (a)-[:KNOWS {w: 3}]->(c),
             (:Island {name: 'x'})
      """

  Scenario: Standalone CALL yields every declared column
    When executing query:
      """
      CALL db.labels()
      """
    Then the result should be, in any order:
      | label    |
      | 'Island' |
      | 'Person' |
    And no side effects

  Scenario: db.relationshipTypes and db.propertyKeys
    When executing query:
      """
      CALL db.relationshipTypes() YIELD relationshipType AS t
      CALL db.propertyKeys() YIELD propertyKey
      RETURN t, collect(propertyKey) AS keys
      """
    Then the result should be, in any order:
      | t       | keys          |
      | 'KNOWS' | ['name', 'w'] |
    And no side effects

  Scenario: YIELD with rename and WHERE filters procedure output
    When executing query:
      """
      CALL algo.degrees() YIELD id AS nid, degree WHERE degree > 0
      MATCH (n) WHERE id(n) = nid
      RETURN n.name AS name, degree
      """
    Then the result should be, in any order:
      | name | degree |
      | 'a'  | 2      |
      | 'b'  | 2      |
      | 'c'  | 2      |
    And no side effects

  Scenario: Procedure output composes with patterns and aggregates
    When executing query:
      """
      CALL algo.connectedComponents() YIELD id, component
      RETURN count(DISTINCT component) AS parts, count(*) AS nodes
      """
    Then the result should be, in any order:
      | parts | nodes |
      | 2     | 4     |
    And no side effects

  Scenario: Triangle count over the created graph
    When executing query:
      """
      CALL algo.triangleCount() YIELD triangles
      RETURN triangles
      """
    Then the result should be, in any order:
      | triangles |
      | 1         |
    And no side effects

  Scenario: Uncorrelated CALL cross-joins with incoming rows
    When executing query:
      """
      UNWIND [1, 2] AS x
      CALL algo.triangleCount() YIELD triangles
      RETURN x, triangles
      """
    Then the result should be, in any order:
      | x | triangles |
      | 1 | 1         |
      | 2 | 1         |
    And no side effects

  Scenario: Procedure arguments accept literals and parameters
    And parameters are:
      | iters | 1 |
    When executing query:
      """
      CALL algo.labelPropagation($iters, ['KNOWS']) YIELD id, label
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |
    And no side effects

  Scenario: kCore filters to the dense core
    When executing query:
      """
      CALL algo.kCore(2) YIELD id, degree
      MATCH (n) WHERE id(n) = id
      RETURN n.name AS name, degree
      """
    Then the result should be, in any order:
      | name | degree |
      | 'a'  | 2      |
      | 'b'  | 2      |
      | 'c'  | 2      |
    And no side effects

  Scenario: Unknown procedure is an error
    When executing query:
      """
      CALL algo.unknownThing() YIELD id
      RETURN id
      """
    Then a ProcedureNotFound should be raised at compile time: ProcedureNotFound

  Scenario: Unknown YIELD column is an error
    When executing query:
      """
      CALL db.labels() YIELD nope
      RETURN nope
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentExpression

  Scenario: YIELD collision with a bound variable is an error
    When executing query:
      """
      WITH 1 AS label
      CALL db.labels() YIELD label
      RETURN label
      """
    Then a SyntaxError should be raised at compile time: VariableAlreadyBound

  Scenario: Correlated procedure arguments are rejected
    When executing query:
      """
      MATCH (n)
      CALL algo.bfs([id(n)]) YIELD id, dist
      RETURN dist
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentExpression
