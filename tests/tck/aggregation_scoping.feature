Feature: AggregationScoping

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Ann', team: 'x', age: 30}),
             (b:Person {name: 'Bob', team: 'x', age: 40}),
             (c:Person {name: 'Cal', team: 'y', age: 50}),
             (a)-[:KNOWS]->(b), (a)-[:KNOWS]->(c), (b)-[:KNOWS]->(c)
      """

  Scenario: Implicit grouping key is the non-aggregated expression
    When executing query:
      """
      MATCH (p:Person) RETURN p.team AS team, count(*) AS n
      """
    Then the result should be, in any order:
      | team | n |
      | 'x'  | 2 |
      | 'y'  | 1 |
    And no side effects

  Scenario: Grouping by a whole node
    When executing query:
      """
      MATCH (p:Person)-[:KNOWS]->() RETURN p, count(*) AS degree
      """
    Then the result should be, in any order:
      | p                                            | degree |
      | (:Person {name: 'Ann', team: 'x', age: 30})  | 2      |
      | (:Person {name: 'Bob', team: 'x', age: 40})  | 1      |
    And no side effects

  Scenario: Aggregation inside WITH then filtered
    When executing query:
      """
      MATCH (p:Person)
      WITH p.team AS team, avg(p.age) AS avg_age
      WHERE avg_age > 40
      RETURN team, avg_age
      """
    Then the result should be, in any order:
      | team | avg_age |
      | 'y'  | 50.0    |
    And no side effects

  Scenario: count DISTINCT versus count
    When executing query:
      """
      MATCH (:Person)-[:KNOWS]->(q:Person)
      RETURN count(q) AS all, count(DISTINCT q) AS uniq
      """
    Then the result should be, in any order:
      | all | uniq |
      | 3   | 2    |
    And no side effects

  Scenario: Aggregation with no matching rows over a grouping key yields no rows
    When executing query:
      """
      MATCH (p:Person {name: 'Zed'}) RETURN p.team AS team, count(*) AS n
      """
    Then the result should be empty
    And no side effects

  Scenario: Global aggregation with no matching rows yields one zero row
    When executing query:
      """
      MATCH (p:Person {name: 'Zed'}) RETURN count(p) AS n
      """
    Then the result should be, in any order:
      | n |
      | 0 |
    And no side effects

  Scenario: collect of node properties per group
    When executing query:
      """
      MATCH (p:Person)
      RETURN p.team AS team, collect(p.name) AS names
      """
    Then the result should be, in any order (ignoring element order for lists):
      | team | names          |
      | 'x'  | ['Ann', 'Bob'] |
      | 'y'  | ['Cal']        |
    And no side effects
