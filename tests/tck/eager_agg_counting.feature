Feature: EagerAggCounting

  # Aggregations over chain patterns whose RETURN references only an
  # interior node — the shapes the planner's eager-aggregation rewrite
  # (planner.py _try_eager_agg) serves with branch-count multiplication
  # instead of the join fan-out, plus the shapes where it must bail
  # (same-type branches, referenced end variables). Results must be
  # identical either way; these scenarios pin the openCypher semantics.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (p1:Prod {name: 'P1', price: 5}),
             (p2:Prod {name: 'P2'}),
             (u1:User {name: 'u1'}), (u2:User {name: 'u2'}), (u3:User {name: 'u3'}),
             (s1:Shop {name: 's1'}), (s2:Shop {name: 's2'}),
             (reg:Reg {name: 'r'}),
             (u1)-[:BOUGHT]->(p1), (u2)-[:BOUGHT]->(p1), (u3)-[:BOUGHT]->(p1),
             (u1)-[:BOUGHT]->(p2),
             (s1)-[:SOLD]->(p1), (s2)-[:SOLD]->(p1), (s2)-[:SOLD]->(p2),
             (s1)-[:IN]->(reg), (s2)-[:IN]->(reg)
      """

  Scenario: count over a shared interior node multiplies branch matches
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN p.name AS name, count(*) AS n
      """
    Then the result should be, in any order:
      | name | n |
      | 'P1' | 6 |
      | 'P2' | 1 |
    And no side effects

  Scenario: sum over an interior property counts each pattern match
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN p.name AS name, sum(p.price) AS total
      """
    Then the result should be, in any order:
      | name | total |
      | 'P1' | 30    |
      | 'P2' | 0     |
    And no side effects

  Scenario: count of a null interior property skips null rows
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN p.name AS name, count(p.price) AS n
      """
    Then the result should be, in any order:
      | name | n |
      | 'P1' | 6 |
      | 'P2' | 0 |
    And no side effects

  Scenario: avg over an interior property is null for all-null groups
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN p.name AS name, avg(p.price) AS mean
      """
    Then the result should be, in any order:
      | name | mean |
      | 'P1' | 5.0  |
      | 'P2' | null |
    And no side effects

  Scenario: min and max over the interior node ignore multiplicity
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN min(p.price) AS lo, max(p.price) AS hi
      """
    Then the result should be, in any order:
      | lo | hi |
      | 5  | 5  |
    And no side effects

  Scenario: global count over the whole chain
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 7 |
    And no side effects

  Scenario: WHERE on the interior node filters before counting
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      WHERE p.price IS NULL
      RETURN p.name AS name, count(*) AS n
      """
    Then the result should be, in any order:
      | name | n |
      | 'P2' | 1 |
    And no side effects

  Scenario: same relationship type on both sides respects rel uniqueness
    When executing query:
      """
      MATCH (x:User)-[:BOUGHT]->(p:Prod)<-[:BOUGHT]-(y:User)
      RETURN p.name AS name, count(*) AS n
      """
    Then the result should be, in any order:
      | name | n |
      | 'P1' | 6 |
    And no side effects

  Scenario: three-hop chain with a two-hop dangling branch
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)-[:IN]->(r:Reg)
      RETURN p.name AS name, count(*) AS n
      """
    Then the result should be, in any order:
      | name | n |
      | 'P1' | 6 |
      | 'P2' | 1 |
    And no side effects

  Scenario: interior span of two variables
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)-[:IN]->(r:Reg)
      RETURN p.name AS pname, s.name AS sname, count(*) AS n
      """
    Then the result should be, in any order:
      | pname | sname | n |
      | 'P1'  | 's1'  | 3 |
      | 'P1'  | 's2'  | 3 |
      | 'P2'  | 's2'  | 1 |
    And no side effects

  Scenario: undirected dangling branch
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]-(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN p.name AS name, count(*) AS n
      """
    Then the result should be, in any order:
      | name | n |
      | 'P1' | 6 |
      | 'P2' | 1 |
    And no side effects

  Scenario: inline property map on a branch node restricts its count
    When executing query:
      """
      MATCH (u:User {name: 'u1'})-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN p.name AS name, count(*) AS n
      """
    Then the result should be, in any order:
      | name | n |
      | 'P1' | 2 |
      | 'P2' | 1 |
    And no side effects

  Scenario: ordering by the aggregate alias
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN p.name AS name, count(*) AS n
      ORDER BY n DESC
      """
    Then the result should be, in order:
      | name | n |
      | 'P1' | 6 |
      | 'P2' | 1 |
    And no side effects

  Scenario: distinct count over the interior node
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN count(DISTINCT p) AS uniq
      """
    Then the result should be, in any order:
      | uniq |
      | 2    |
    And no side effects

  Scenario: end variable in the RETURN keeps the full join semantics
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN u.name AS buyer, count(*) AS n
      """
    Then the result should be, in any order:
      | buyer | n |
      | 'u1'  | 3 |
      | 'u2'  | 2 |
      | 'u3'  | 2 |
    And no side effects

  Scenario: WITH-aggregation over the shared node feeds a later WHERE
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      WITH p.name AS name, count(*) AS pairs
      WHERE pairs > 2
      RETURN name, pairs
      """
    Then the result should be, in any order:
      | name | pairs |
      | 'P1' | 6     |
    And no side effects

  Scenario: DISTINCT projection over the interior node needs only branch existence
    When executing query:
      """
      MATCH (u:User)-[:BOUGHT]->(p:Prod)<-[:SOLD]-(s:Shop)
      RETURN DISTINCT p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'P1' |
      | 'P2' |
    And no side effects
