Feature: OptionalMatchAndCase

  Scenario: OPTIONAL MATCH keeps unmatched rows with nulls
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Ann'}), (b:Person {name: 'Bob'}),
             (c:City {name: 'Oslo'}), (a)-[:LIVES_IN]->(c)
      """
    When executing query:
      """
      MATCH (p:Person) OPTIONAL MATCH (p)-[:LIVES_IN]->(c:City)
      RETURN p.name AS person, c.name AS city
      """
    Then the result should be, in any order:
      | person | city   |
      | 'Ann'  | 'Oslo' |
      | 'Bob'  | null   |
    And no side effects

  Scenario: OPTIONAL MATCH with WHERE filters inside the optional part
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'x'}), (b:Q {v: 1}), (c:Q {v: 2}),
             (a)-[:R]->(b), (a)-[:R]->(c)
      """
    When executing query:
      """
      MATCH (p:P) OPTIONAL MATCH (p)-[:R]->(q:Q) WHERE q.v > 1
      RETURN p.name AS name, q.v AS v
      """
    Then the result should be, in any order:
      | name | v |
      | 'x'  | 2 |
    And no side effects

  Scenario: Simple CASE expression
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N {v: 3})
      """
    When executing query:
      """
      MATCH (n:N)
      RETURN n.v AS v,
             CASE n.v WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS w
      """
    Then the result should be, in any order:
      | v | w      |
      | 1 | 'one'  |
      | 2 | 'two'  |
      | 3 | 'many' |
    And no side effects

  Scenario: Searched CASE with null fallthrough
    Given an empty graph
    And having executed:
      """
      CREATE (:M {v: 5}), (:M)
      """
    When executing query:
      """
      MATCH (m:M)
      RETURN CASE WHEN m.v > 3 THEN 'big' WHEN m.v <= 3 THEN 'small' END AS c
      """
    Then the result should be, in any order:
      | c     |
      | 'big' |
      | null  |
    And no side effects

  Scenario: coalesce picks the first non-null
    Given an empty graph
    And having executed:
      """
      CREATE (:C {a: 1}), (:C {b: 2}), (:C)
      """
    When executing query:
      """
      MATCH (c:C) RETURN coalesce(c.a, c.b, -1) AS v
      """
    Then the result should be, in any order:
      | v  |
      | 1  |
      | 2  |
      | -1 |
    And no side effects

  Scenario: Null comparisons are null and filtered out
    Given an empty graph
    And having executed:
      """
      CREATE (:Z {v: 1}), (:Z)
      """
    When executing query:
      """
      MATCH (z:Z) WHERE z.v > 0 RETURN z.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
    And no side effects
