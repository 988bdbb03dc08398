Feature: PatternComprehension

  # The official TCK's PatternComprehension family — blacklisted as
  # failing by the reference (morpheus-tck failing_blacklist), supported
  # here via the EXISTS-subquery machinery's list-producing form.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Ann'}), (b:Person {name: 'Bob'}),
             (c:Person {name: 'Cat'}),
             (x:Post {title: 'p1', score: 5}), (y:Post {title: 'p2', score: 9}),
             (a)-[:WROTE {year: 2020}]->(x), (a)-[:WROTE {year: 2022}]->(y),
             (a)-[:KNOWS]->(b), (b)-[:KNOWS]->(c)
      """

  Scenario: Returning a pattern comprehension
    When executing query:
      """
      MATCH (p:Person {name: 'Ann'})
      RETURN [(p)-[:WROTE]->(q) | q.title] AS titles
      """
    Then the result should be, in any order (ignoring element order for lists):
      | titles       |
      | ['p1', 'p2'] |
    And no side effects

  Scenario: Returning a pattern comprehension with label predicate
    When executing query:
      """
      MATCH (p:Person {name: 'Ann'})
      RETURN [(p)-->(x:Post) | x.score] AS scores
      """
    Then the result should be, in any order (ignoring element order for lists):
      | scores |
      | [5, 9] |
    And no side effects

  Scenario: Pattern comprehension with WHERE inside
    When executing query:
      """
      MATCH (p:Person {name: 'Ann'})
      RETURN [(p)-[w:WROTE]->(q) WHERE w.year > 2020 | q.title] AS titles
      """
    Then the result should be, in any order (ignoring element order for lists):
      | titles |
      | ['p2'] |
    And no side effects

  Scenario: Non-matching rows get an empty list, not null
    When executing query:
      """
      MATCH (p:Person)
      RETURN p.name AS name, [(p)-[:WROTE]->(q) | q.title] AS titles
      """
    Then the result should be, in any order (ignoring element order for lists):
      | name  | titles       |
      | 'Ann' | ['p1', 'p2'] |
      | 'Bob' | []           |
      | 'Cat' | []           |
    And no side effects

  Scenario: Using a pattern comprehension in a WITH
    When executing query:
      """
      MATCH (p:Person)
      WITH p.name AS name, [(p)-[:KNOWS]->(f) | f.name] AS friends
      RETURN name, size(friends) AS n
      """
    Then the result should be, in any order:
      | name  | n |
      | 'Ann' | 1 |
      | 'Bob' | 1 |
      | 'Cat' | 0 |
    And no side effects

  Scenario: Aggregating on pattern comprehension
    When executing query:
      """
      MATCH (p:Person)
      RETURN sum(size([(p)-[:WROTE]->(q) | 1])) AS posts
      """
    Then the result should be, in any order:
      | posts |
      | 2     |
    And no side effects

  Scenario: Get node degree via size of pattern comprehension
    When executing query:
      """
      MATCH (p:Person)
      RETURN p.name AS name, size([(p)-->(x) | 1]) AS deg
      """
    Then the result should be, in any order:
      | name  | deg |
      | 'Ann' | 3   |
      | 'Bob' | 1   |
      | 'Cat' | 0   |
    And no side effects

  Scenario: Get node degree via size of pattern
    When executing query:
      """
      MATCH (p:Person)
      RETURN p.name AS name, size((p)-[:WROTE]->()) AS wrote
      """
    Then the result should be, in any order:
      | name  | wrote |
      | 'Ann' | 2     |
      | 'Bob' | 0     |
      | 'Cat' | 0     |
    And no side effects

  Scenario: Pattern comprehension referencing the outer row in the projection
    When executing query:
      """
      MATCH (p:Person {name: 'Ann'})
      RETURN [(p)-[w:WROTE]->(q) | p.name + ':' + q.title] AS tagged
      """
    Then the result should be, in any order (ignoring element order for lists):
      | tagged               |
      | ['Ann:p1', 'Ann:p2'] |
    And no side effects

  Scenario: Pattern comprehension and ORDER BY
    When executing query:
      """
      MATCH (p:Person)
      RETURN p.name AS name, size([(p)-->(x) | 1]) AS deg
      ORDER BY deg DESC, name
      """
    Then the result should be, in order:
      | name  | deg |
      | 'Ann' | 3   |
      | 'Bob' | 1   |
      | 'Cat' | 0   |
    And no side effects

  Scenario: Using pattern comprehension to test existence
    When executing query:
      """
      MATCH (p:Person)
      WHERE size([(p)-[:WROTE]->(x) | 1]) > 0
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'Ann' |
    And no side effects

  Scenario: Introducing new relationship variable in pattern comprehension
    When executing query:
      """
      MATCH (p:Person {name: 'Ann'})
      RETURN [(p)-[w:WROTE]->(x) | w.year] AS years
      """
    Then the result should be, in any order (ignoring element order for lists):
      | years        |
      | [2020, 2022] |
    And no side effects

  Scenario: Pattern comprehension inside list comprehension
    When executing query:
      """
      MATCH (p:Person {name: 'Ann'})
      WITH [(p)-[w:WROTE]->(x) | w.year] AS years
      RETURN [y IN years WHERE y > 2020 | y - 2000] AS late
      """
    Then the result should be, in any order (ignoring element order for lists):
      | late |
      | [22] |
    And no side effects

  Scenario: Uncorrelated pattern comprehension
    When executing query:
      """
      RETURN size([(a:Person)-[:KNOWS]->(b) | 1]) AS pairs
      """
    Then the result should be, in any order:
      | pairs |
      | 2     |
    And no side effects

  Scenario: Null projection values survive in the comprehension list
    When executing query:
      """
      MATCH (p:Person {name: 'Ann'})
      RETURN [(p)-[:WROTE]->(q) | q.missing] AS vals
      """
    Then the result should be, in any order (ignoring element order for lists):
      | vals         |
      | [null, null] |
    And no side effects

  Scenario: Mixed null and non-null projection values keep list length
    When executing query:
      """
      MATCH (p:Person {name: 'Ann'})
      RETURN size([(p)-[w:WROTE]->(q) | CASE WHEN w.year > 2020 THEN q.title ELSE null END]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And no side effects
