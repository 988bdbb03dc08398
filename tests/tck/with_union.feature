Feature: WithUnion

  Scenario: WITH chains filters on projected values
    Given an empty graph
    And having executed:
      """
      CREATE (:E {v: 1}), (:E {v: 2}), (:E {v: 3}), (:E {v: 4})
      """
    When executing query:
      """
      MATCH (e:E) WITH e.v AS v WHERE v > 1
      WITH v * 10 AS w WHERE w < 40
      RETURN w
      """
    Then the result should be, in any order:
      | w  |
      | 20 |
      | 30 |
    And no side effects

  Scenario: WITH ORDER BY LIMIT then WHERE applies after the cut
    Given an empty graph
    And having executed:
      """
      CREATE (:F {v: 1}), (:F {v: 2}), (:F {v: 3}), (:F {v: 4})
      """
    When executing query:
      """
      MATCH (f:F) WITH f.v AS v ORDER BY v DESC LIMIT 2 WHERE v < 4 RETURN v
      """
    Then the result should be, in any order:
      | v |
      | 3 |
    And no side effects

  Scenario: UNION deduplicates rows
    Given an empty graph
    And having executed:
      """
      CREATE (:G {name: 'x'}), (:H {name: 'x'}), (:H {name: 'y'})
      """
    When executing query:
      """
      MATCH (g:G) RETURN g.name AS name
      UNION
      MATCH (h:H) RETURN h.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'x'  |
      | 'y'  |
    And no side effects

  Scenario: UNION ALL keeps duplicates
    Given an empty graph
    And having executed:
      """
      CREATE (:G {name: 'x'}), (:H {name: 'x'})
      """
    When executing query:
      """
      MATCH (g:G) RETURN g.name AS name
      UNION ALL
      MATCH (h:H) RETURN h.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'x'  |
      | 'x'  |
    And no side effects

  Scenario: UNWIND a literal list
    Given an empty graph
    And having executed:
      """
      CREATE (:Q)
      """
    When executing query:
      """
      MATCH (:Q) UNWIND [1, 2, 3] AS x RETURN x
      """
    Then the result should be, in any order:
      | x |
      | 1 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: UNWIND pairs with source rows
    Given an empty graph
    And having executed:
      """
      CREATE (:R {n: 'a'}), (:R {n: 'b'})
      """
    When executing query:
      """
      MATCH (r:R) UNWIND [1, 2] AS i RETURN r.n AS n, i
      """
    Then the result should be, in any order:
      | n   | i |
      | 'a' | 1 |
      | 'a' | 2 |
      | 'b' | 1 |
      | 'b' | 2 |
    And no side effects

  Scenario: Exists pattern predicate filters rows
    Given an empty graph
    And having executed:
      """
      CREATE (a:Person {name: 'Ada'})-[:OWNS]->(:Car),
             (:Person {name: 'Bob'})
      """
    When executing query:
      """
      MATCH (p:Person) WHERE exists((p)-[:OWNS]->(:Car))
      RETURN p.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'Ada' |
    And no side effects

  Scenario: Skip and limit paginate an ordered result
    Given an empty graph
    And having executed:
      """
      CREATE (:P2 {v: 1}), (:P2 {v: 2}), (:P2 {v: 3}), (:P2 {v: 4}), (:P2 {v: 5})
      """
    When executing query:
      """
      MATCH (p:P2) RETURN p.v AS v ORDER BY v SKIP 1 LIMIT 2
      """
    Then the result should be, in order:
      | v |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Multiple labels on a node
    Given an empty graph
    And having executed:
      """
      CREATE (:Actor:Director {name: 'Clint'}), (:Actor {name: 'Tom'})
      """
    When executing query:
      """
      MATCH (a:Actor:Director) RETURN a.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Clint' |
    And no side effects

  Scenario: coalesce picks the first non-null
    Given an empty graph
    And having executed:
      """
      CREATE (:C1 {a: 1}), (:C1 {b: 2})
      """
    When executing query:
      """
      MATCH (c:C1) RETURN coalesce(c.a, c.b, -1) AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
    And no side effects
