Feature: OptionalMatch2

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Alice'}), (b:Person {name: 'Bob'}),
             (c:Person {name: 'Carol'}),
             (t1:Team {tag: 'red'}), (t2:Team {tag: 'blue'}),
             (a)-[:IN]->(t1), (b)-[:IN]->(t2),
             (a)-[:KNOWS]->(b)
      """

  Scenario: Optional expansion fills null for non-matching rows
    When executing query:
      """
      MATCH (p:Person) OPTIONAL MATCH (p)-[:IN]->(t:Team)
      RETURN p.name AS name, t.tag AS tag
      """
    Then the result should be, in any order:
      | name    | tag    |
      | 'Alice' | 'red'  |
      | 'Bob'   | 'blue' |
      | 'Carol' | null   |
    And no side effects

  Scenario: Optional match with WHERE inside the optional part
    When executing query:
      """
      MATCH (p:Person)
      OPTIONAL MATCH (p)-[:IN]->(t:Team) WHERE t.tag = 'red'
      RETURN p.name AS name, t.tag AS tag
      """
    Then the result should be, in any order:
      | name    | tag   |
      | 'Alice' | 'red' |
      | 'Bob'   | null  |
      | 'Carol' | null  |
    And no side effects

  Scenario: Two chained optional matches
    When executing query:
      """
      MATCH (p:Person)
      OPTIONAL MATCH (p)-[:KNOWS]->(f:Person)
      OPTIONAL MATCH (f)-[:IN]->(t:Team)
      RETURN p.name AS name, f.name AS friend, t.tag AS tag
      """
    Then the result should be, in any order:
      | name    | friend | tag    |
      | 'Alice' | 'Bob'  | 'blue' |
      | 'Bob'   | null   | null   |
      | 'Carol' | null   | null   |
    And no side effects

  Scenario: Aggregation over optional results counts nulls as zero
    When executing query:
      """
      MATCH (p:Person) OPTIONAL MATCH (p)-[:IN]->(t:Team)
      RETURN p.name AS name, count(t) AS n
      """
    Then the result should be, in any order:
      | name    | n |
      | 'Alice' | 1 |
      | 'Bob'   | 1 |
      | 'Carol' | 0 |
    And no side effects

  Scenario: Optional match on a nonexistent relationship type
    When executing query:
      """
      MATCH (p:Person {name: 'Alice'})
      OPTIONAL MATCH (p)-[:NO_SUCH]->(x)
      RETURN p.name AS name, x AS x
      """
    Then the result should be, in any order:
      | name    | x    |
      | 'Alice' | null |
    And no side effects

  Scenario: Optional match starting from nothing yields a single null row
    When executing query:
      """
      OPTIONAL MATCH (g:Ghost) RETURN g AS g
      """
    Then the result should be, in any order:
      | g    |
      | null |
    And no side effects

  Scenario: Properties of an optional null node are null
    When executing query:
      """
      MATCH (p:Person {name: 'Carol'})
      OPTIONAL MATCH (p)-[:IN]->(t:Team)
      RETURN t.tag AS tag, labels(t) AS ls
      """
    Then the result should be, in any order:
      | tag  | ls   |
      | null | null |
    And no side effects

  Scenario: Optional match reusing a bound endpoint
    When executing query:
      """
      MATCH (a:Person {name: 'Alice'}), (b:Person {name: 'Carol'})
      OPTIONAL MATCH (a)-[k:KNOWS]->(b)
      RETURN a.name AS a, b.name AS b, k AS k
      """
    Then the result should be, in any order:
      | a       | b       | k    |
      | 'Alice' | 'Carol' | null |
    And no side effects

  Scenario: Optional result used in arithmetic stays null
    When executing query:
      """
      MATCH (p:Person) OPTIONAL MATCH (p)-[:IN]->(t:Team)
      WITH p, t WHERE t IS NULL
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Carol' |
    And no side effects

  Scenario: DISTINCT over optional nulls keeps one null
    When executing query:
      """
      MATCH (p:Person) OPTIONAL MATCH (p)-[:NO_SUCH]->(x)
      RETURN DISTINCT x AS x
      """
    Then the result should be, in any order:
      | x    |
      | null |
    And no side effects
