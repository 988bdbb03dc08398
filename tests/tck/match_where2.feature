Feature: MatchWhere2

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Alice', age: 30, city: 'Berlin'}),
             (b:Person {name: 'Bob', age: 25, city: 'Paris'}),
             (c:Person {name: 'Carol', age: 35}),
             (d:Person {name: 'Dan', age: 25, city: 'Berlin'}),
             (a)-[:KNOWS {since: 2015}]->(b),
             (b)-[:KNOWS {since: 2018}]->(c),
             (a)-[:KNOWS {since: 2020}]->(d)
      """

  Scenario: Conjunction of property predicates
    When executing query:
      """
      MATCH (p:Person) WHERE p.age = 25 AND p.city = 'Berlin'
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'Dan' |
    And no side effects

  Scenario: Disjunction of property predicates
    When executing query:
      """
      MATCH (p:Person) WHERE p.age > 30 OR p.city = 'Paris'
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Bob'   |
      | 'Carol' |
    And no side effects

  Scenario: XOR of predicates
    When executing query:
      """
      MATCH (p:Person) WHERE p.age = 25 XOR p.city = 'Berlin'
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Alice' |
      | 'Bob'   |
    And no side effects

  Scenario: Negation with NOT
    When executing query:
      """
      MATCH (p:Person) WHERE NOT p.age = 25
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Alice' |
      | 'Carol' |
    And no side effects

  Scenario: Missing property IS NULL
    When executing query:
      """
      MATCH (p:Person) WHERE p.city IS NULL RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Carol' |
    And no side effects

  Scenario: Missing property comparison filters the row out
    When executing query:
      """
      MATCH (p:Person) WHERE p.city = 'Berlin' RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Alice' |
      | 'Dan'   |
    And no side effects

  Scenario: WHERE on relationship property
    When executing query:
      """
      MATCH (a)-[k:KNOWS]->(b) WHERE k.since >= 2018
      RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a       | b       |
      | 'Bob'   | 'Carol' |
      | 'Alice' | 'Dan'   |
    And no side effects

  Scenario: Chained comparison in WHERE
    When executing query:
      """
      MATCH (p:Person) WHERE 25 < p.age <= 30 RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Alice' |
    And no side effects

  Scenario: IN against a literal list in WHERE
    When executing query:
      """
      MATCH (p:Person) WHERE p.name IN ['Alice', 'Carol', 'Zed']
      RETURN p.age AS age
      """
    Then the result should be, in any order:
      | age |
      | 30  |
      | 35  |
    And no side effects

  Scenario: STARTS WITH and ENDS WITH combined
    When executing query:
      """
      MATCH (p:Person)
      WHERE p.name STARTS WITH 'A' OR p.name ENDS WITH 'n'
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Alice' |
      | 'Dan'   |
    And no side effects

  Scenario: CONTAINS on a property
    When executing query:
      """
      MATCH (p:Person) WHERE p.name CONTAINS 'ar' RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Carol' |
    And no side effects

  Scenario: Label predicate in WHERE
    When executing query:
      """
      MATCH (n) WHERE n:Person AND n.age = 35 RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Carol' |
    And no side effects

  Scenario: WHERE referencing two pattern nodes
    When executing query:
      """
      MATCH (a:Person)-[:KNOWS]->(b:Person) WHERE a.age > b.age
      RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a       | b     |
      | 'Alice' | 'Bob' |
      | 'Alice' | 'Dan' |
    And no side effects

  Scenario: Equality on inline property map plus WHERE
    When executing query:
      """
      MATCH (p:Person {age: 25}) WHERE p.city STARTS WITH 'P'
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'Bob' |
    And no side effects

  Scenario: NOT NULL filter keeps only bound values
    When executing query:
      """
      MATCH (p:Person) WHERE p.city IS NOT NULL
      RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 3 |
    And no side effects
