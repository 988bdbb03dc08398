Feature: CountSubquery

  # COUNT { pattern [WHERE p] } — parsed as sugar over the size-of-
  # pattern machinery (parser lowers it to size(PatternPredicate), the
  # planner to a `| 1` pattern comprehension). Beyond reference parity:
  # the reference has no subquery expressions at all.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(b:P {name: 'b'}),
             (a)-[:T]->(c:P {name: 'c'}),
             (b)-[:T]->(c),
             (a)-[:U]->(b)
      """

  Scenario: COUNT subquery in a RETURN item
    When executing query:
      """
      MATCH (p:P)
      RETURN p.name AS n, COUNT { (p)-[:T]->() } AS deg
      """
    Then the result should be, in any order:
      | n   | deg |
      | 'a' | 2   |
      | 'b' | 1   |
      | 'c' | 0   |
    And no side effects

  Scenario: COUNT subquery with a WHERE inside
    When executing query:
      """
      MATCH (p:P)
      RETURN p.name AS n, COUNT { (p)-[:T]->(q) WHERE q.name <> 'c' } AS deg
      """
    Then the result should be, in any order:
      | n   | deg |
      | 'a' | 1   |
      | 'b' | 0   |
      | 'c' | 0   |
    And no side effects

  Scenario: COUNT subquery as a predicate
    When executing query:
      """
      MATCH (p:P)
      WHERE COUNT { (p)-[:T]->() } >= 2
      RETURN p.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |
    And no side effects

  Scenario: COUNT subquery over an undirected pattern
    When executing query:
      """
      MATCH (p:P {name: 'b'})
      RETURN COUNT { (p)-[:T]-() } AS deg
      """
    Then the result should be, in any order:
      | deg |
      | 2   |
    And no side effects

  Scenario: COUNT subquery counts every match, not distinct endpoints
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      RETURN COUNT { (p)-[]->(:P {name: 'b'}) } AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |
    And no side effects

  Scenario: COUNT subquery in arithmetic
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      RETURN COUNT { (p)-[:T]->() } + COUNT { (p)-[:U]->() } AS total
      """
    Then the result should be, in any order:
      | total |
      | 3     |
    And no side effects

  Scenario: COUNT with MATCH keyword inside the braces
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      RETURN COUNT { MATCH (p)-[:T]->(x) } AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |
    And no side effects

  Scenario: count(*) aggregation is unaffected by the subquery syntax
    When executing query:
      """
      MATCH (p:P)
      RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |
    And no side effects
