Feature: ElementValues

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Ann'})-[:KNOWS {since: 2015}]->(b:Person:Admin {name: 'Bob'}),
             (a)-[:LIKES]->(c:Thing)
      """

  Scenario: Returning whole nodes
    When executing query:
      """
      MATCH (p:Person) RETURN p
      """
    Then the result should be, in any order:
      | p                              |
      | (:Person {name: 'Ann'})        |
      | (:Person:Admin {name: 'Bob'})  |
    And no side effects

  Scenario: Returning whole relationships
    When executing query:
      """
      MATCH ()-[r:KNOWS]->() RETURN r
      """
    Then the result should be, in any order:
      | r                      |
      | [:KNOWS {since: 2015}] |
    And no side effects

  Scenario: Node without properties
    When executing query:
      """
      MATCH (t:Thing) RETURN t
      """
    Then the result should be, in any order:
      | t        |
      | (:Thing) |
    And no side effects

  Scenario: labels and type functions
    When executing query:
      """
      MATCH (p {name: 'Bob'}) RETURN labels(p) AS ls
      """
    Then the result should be, in any order (ignoring element order for lists):
      | ls                  |
      | ['Person', 'Admin'] |
    And no side effects

  Scenario: type of matched relationships
    When executing query:
      """
      MATCH ()-[r]->() RETURN type(r) AS t ORDER BY t
      """
    Then the result should be, in order:
      | t       |
      | 'KNOWS' |
      | 'LIKES' |
    And no side effects

  Scenario: properties function yields a map
    When executing query:
      """
      MATCH ()-[r:KNOWS]->() RETURN properties(r) AS m
      """
    Then the result should be, in any order:
      | m             |
      | {since: 2015} |
    And no side effects
