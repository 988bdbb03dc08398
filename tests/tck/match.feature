Feature: Match

  Scenario: Match all nodes and return a property
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Alice', age: 30}), (:Person {name: 'Bob', age: 25})
      """
    When executing query:
      """
      MATCH (p:Person) RETURN p.name AS name, p.age AS age
      """
    Then the result should be, in any order:
      | name    | age |
      | 'Alice' | 30  |
      | 'Bob'   | 25  |
    And no side effects

  Scenario: Match nothing on an empty graph
    Given an empty graph
    When executing query:
      """
      MATCH (n) RETURN n.name AS name
      """
    Then the result should be empty
    And no side effects

  Scenario: Match a relationship pattern with direction
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Alice'})-[:KNOWS {since: 2015}]->(b:Person {name: 'Bob'}),
             (b)-[:KNOWS {since: 2020}]->(c:Person {name: 'Carol'})
      """
    When executing query:
      """
      MATCH (a)-[k:KNOWS]->(b) RETURN a.name AS a, k.since AS since, b.name AS b
      """
    Then the result should be, in any order:
      | a       | since | b       |
      | 'Alice' | 2015  | 'Bob'   |
      | 'Bob'   | 2020  | 'Carol' |
    And no side effects

  Scenario: Undirected match returns both orientations
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Alice'})-[:KNOWS]->(b:Person {name: 'Bob'})
      """
    When executing query:
      """
      MATCH (x:Person)-[:KNOWS]-(y:Person) RETURN x.name AS x, y.name AS y
      """
    Then the result should be, in any order:
      | x       | y       |
      | 'Alice' | 'Bob'   |
      | 'Bob'   | 'Alice' |
    And no side effects

  Scenario: Match with inline property predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:City {name: 'Malmo', country: 'SE'}), (:City {name: 'Berlin', country: 'DE'})
      """
    When executing query:
      """
      MATCH (c:City {country: 'SE'}) RETURN c.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Malmo' |
    And no side effects

  Scenario: Match a label that does not exist in the graph
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Alice'})
      """
    When executing query:
      """
      MATCH (m:Movie) RETURN m.title AS title
      """
    Then the result should be empty
    And no side effects

  Scenario: Optional match keeps unmatched rows as null
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Alice'})-[:KNOWS]->(b:Person {name: 'Bob'}),
             (:Person {name: 'Carol'})
      """
    When executing query:
      """
      MATCH (p:Person) OPTIONAL MATCH (p)-[:KNOWS]->(f)
      RETURN p.name AS name, f.name AS friend
      """
    Then the result should be, in any order:
      | name    | friend |
      | 'Alice' | 'Bob'  |
      | 'Bob'   | null   |
      | 'Carol' | null   |
    And no side effects

  Scenario: Variable-length path of bounded length
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {n: 1})-[:R]->(b:P {n: 2})-[:R]->(c:P {n: 3})
      """
    When executing query:
      """
      MATCH (a:P {n: 1})-[:R*1..2]->(x) RETURN x.n AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
      | 3 |
    And no side effects
