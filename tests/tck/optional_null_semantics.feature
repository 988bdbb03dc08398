Feature: OptionalNullSemantics

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:R]->(b:P {name: 'b'}), (:P {name: 'c'}),
             (:Q {name: 'q'})
      """

  Scenario: OPTIONAL MATCH keeps unmatched rows with nulls
    When executing query:
      """
      MATCH (p:P) OPTIONAL MATCH (p)-[:R]->(x)
      RETURN p.name AS name, x.name AS other
      """
    Then the result should be, in any order:
      | name | other |
      | 'a'  | 'b'   |
      | 'b'  | null  |
      | 'c'  | null  |
    And no side effects

  Scenario: Properties of a null node are null not errors
    When executing query:
      """
      MATCH (p:P {name: 'c'}) OPTIONAL MATCH (p)-[:R]->(x)
      RETURN x.name AS n, labels(x) AS ls, x IS NULL AS isnull
      """
    Then the result should be, in any order:
      | n    | ls   | isnull |
      | null | null | true   |
    And no side effects

  Scenario: OPTIONAL MATCH on a label with no node table
    When executing query:
      """
      MATCH (p:P {name: 'a'}) OPTIONAL MATCH (p)-[:R]->(z:Zebra)
      RETURN p.name AS name, z.name AS zn
      """
    Then the result should be, in any order:
      | name | zn   |
      | 'a'  | null |
    And no side effects

  Scenario: WHERE inside OPTIONAL MATCH filters the match not the row
    When executing query:
      """
      MATCH (p:P) OPTIONAL MATCH (p)-[:R]->(x) WHERE x.name = 'zzz'
      RETURN p.name AS name, x.name AS other
      """
    Then the result should be, in any order:
      | name | other |
      | 'a'  | null  |
      | 'b'  | null  |
      | 'c'  | null  |
    And no side effects

  Scenario: coalesce picks the first non-null
    When executing query:
      """
      MATCH (p:P) OPTIONAL MATCH (p)-[:R]->(x)
      RETURN coalesce(x.name, p.name, 'zz') AS pick
      """
    Then the result should be, in any order:
      | pick |
      | 'b'  |
      | 'b'  |
      | 'c'  |
    And no side effects
