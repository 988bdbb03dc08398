Feature: PatternPredicates

  Scenario: Positive pattern predicate in WHERE
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(:Q), (:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) WHERE (p)-[:T]->() RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
    And no side effects

  Scenario: Negated pattern predicate
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(:Q), (:P {name: 'b'})
      """
    When executing query:
      """
      MATCH (p:P) WHERE NOT (p)-[:T]->() RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
    And no side effects

  Scenario: Pattern predicate with endpoint label
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a'})-[:T]->(:Q), (b:P {name: 'b'})-[:T]->(:R)
      """
    When executing query:
      """
      MATCH (p:P) WHERE (p)-[:T]->(:Q) RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
    And no side effects

  Scenario: Pattern predicate combined with property filter
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a', v: 1})-[:T]->(:Q),
             (:P {name: 'b', v: 2})-[:T]->(:Q),
             (:P {name: 'c', v: 2})
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.v = 2 AND (p)-[:T]->() RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
    And no side effects

  Scenario: Pattern predicate in OR
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a', v: 9})-[:T]->(:Q),
             (:P {name: 'b', v: 2}),
             (:P {name: 'c', v: 9})
      """
    When executing query:
      """
      MATCH (p:P) WHERE p.v = 2 OR (p)-[:T]->() RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'b'  |
    And no side effects

  Scenario: Incoming-direction pattern predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'a'})-[:T]->(q:Q {name: 'q1'}), (:Q {name: 'q2'})
      """
    When executing query:
      """
      MATCH (q:Q) WHERE (q)<-[:T]-() RETURN q.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'q1' |
    And no side effects
