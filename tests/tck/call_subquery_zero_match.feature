Feature: CallSubqueryZeroMatch

  # Neo4j-exact zero-match semantics in correlated CALL { } (round 7):
  # - ungrouped (all-aggregate) RETURN: one row per input row, empty
  #   aggregates filled (count/sum 0, collect [], min/max/avg null);
  # - grouped / mixed RETURN: zero rows produce no groups, the input row
  #   is eliminated;
  # - composite aggregates (count(q) + 1): the fill folds through the
  #   composition;
  # - intermediate all-aggregate WITH: the filled row flows on through
  #   the rest of the subquery, WHERE filters after the fill.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T {w: 1}]->(b:P {name: 'b'}),
             (a)-[:T {w: 2}]->(c:P {name: 'c'}),
             (:P {name: 'lonely'})
      """

  Scenario: Zero-match grouped aggregate eliminates the input row
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN q.name AS qn, count(*) AS c }
      RETURN p.name AS n, qn, c
      """
    Then the result should be, in any order:
      | n   | qn  | c |
      | 'a' | 'b' | 1 |
      | 'a' | 'c' | 1 |
    And no side effects

  Scenario: Zero-match mixed aggregate and non-aggregate RETURN eliminates the input row
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[r:T]->(q) RETURN q.name AS qn, sum(r.w) AS s }
      RETURN p.name AS n, qn, s
      """
    Then the result should be, in any order:
      | n   | qn  | s |
      | 'a' | 'b' | 1 |
      | 'a' | 'c' | 2 |
    And no side effects

  Scenario: Composite aggregate fills through the composition on zero match
    When executing query:
      """
      MATCH (p:P {name: 'lonely'})
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN count(q) + 1 AS c }
      RETURN p.name AS n, c
      """
    Then the result should be, in any order:
      | n        | c |
      | 'lonely' | 1 |
    And no side effects

  Scenario: Composite collect fill keeps size zero on zero match
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN size(collect(q.name)) AS s }
      RETURN p.name AS n, s
      """
    Then the result should be, in any order:
      | n        | s |
      | 'a'      | 2 |
      | 'b'      | 0 |
      | 'c'      | 0 |
      | 'lonely' | 0 |
    And no side effects

  Scenario: Composite aggregate with a matched row still computes the composition
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      CALL { WITH p MATCH (p)-[r:T]->(q) RETURN sum(r.w) * 10 AS s }
      RETURN p.name AS n, s
      """
    Then the result should be, in any order:
      | n   | s  |
      | 'a' | 30 |
    And no side effects

  Scenario: Intermediate all-aggregate WITH keeps zero-match rows
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) WITH count(q) AS c RETURN c * 10 AS d }
      RETURN p.name AS n, d
      """
    Then the result should be, in any order:
      | n        | d  |
      | 'a'      | 20 |
      | 'b'      | 0  |
      | 'c'      | 0  |
      | 'lonely' | 0  |
    And no side effects

  Scenario: WHERE on an intermediate aggregate WITH filters after the fill
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) WITH count(q) AS c WHERE c = 0 RETURN c }
      RETURN p.name AS n, c
      """
    Then the result should be, in any order:
      | n        | c |
      | 'b'      | 0 |
      | 'c'      | 0 |
      | 'lonely' | 0 |
    And no side effects

  Scenario: Composite intermediate WITH fills through the composition
    When executing query:
      """
      MATCH (p:P {name: 'lonely'})
      CALL { WITH p MATCH (p)-[:T]->(q) WITH count(q) + 1 AS c RETURN c }
      RETURN p.name AS n, c
      """
    Then the result should be, in any order:
      | n        | c |
      | 'lonely' | 1 |
    And no side effects

  Scenario: Implicit grouping expression inside a composite aggregate is rejected
    When executing query:
      """
      MATCH (p:P)
      CALL { WITH p MATCH (p)-[:T]->(q) RETURN count(q) + p.name AS c }
      RETURN p.name AS n, c
      """
    Then a SyntaxError should be raised at compile time: *
