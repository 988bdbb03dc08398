Feature: BeyondReference

  # Scenarios the REFERENCE blacklists as failing
  # (morpheus-tck/src/test/resources/failing_blacklist) but this engine
  # handles — each mirrors the behavior of the named official-TCK
  # scenario in our own words/data.

  Scenario: Unwinding a collected expression
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 3}), (:N {v: 1}), (:N {v: 2})
      """
    When executing query:
      """
      MATCH (n:N) WITH collect(n.v) AS vs UNWIND vs AS v RETURN v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Concatenating lists of same type
    Given any graph
    When executing query:
      """
      RETURN [1, 10, 100] + [4, 5] AS foo
      """
    Then the result should be, in any order:
      | foo               |
      | [1, 10, 100, 4, 5] |
    And no side effects

  Scenario: Appending lists of same type
    Given any graph
    When executing query:
      """
      RETURN [1, 10, 100] + 4 AS foo
      """
    Then the result should be, in any order:
      | foo             |
      | [1, 10, 100, 4] |
    And no side effects

  Scenario: Projecting an arithmetic expression with aggregation
    Given an empty graph
    And having executed:
      """
      CREATE (:X {num: 42})
      """
    When executing query:
      """
      MATCH (x:X) RETURN x.num AS num, count(x) + 3 AS c
      """
    Then the result should be, in any order:
      | num | c |
      | 42  | 4 |
    And no side effects

  Scenario: Matching using a relationship that is already bound
    Given an empty graph
    And having executed:
      """
      CREATE (a:T1 {name: 'a'})-[:T]->(b:T2 {name: 'b'}),
             (c:T1 {name: 'c'})-[:Y]->(d:T2 {name: 'd'})
      """
    When executing query:
      """
      MATCH ()-[r1:T]->() WITH r1 AS r2 MATCH (a)-[r2]->(b)
      RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 'a' | 'b' |
    And no side effects

  Scenario: Matching twice with conflicting relationship types on same relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'x'})-[:T]->(:B {name: 'y'})
      """
    When executing query:
      """
      MATCH (a)-[r:T]->(b) MATCH (a2)-[r:Y]->(b2)
      RETURN a2.name AS n
      """
    Then the result should be empty
    And no side effects

  Scenario: Matching twice with duplicate relationship types on same relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'x'})-[:T]->(:B {name: 'y'})
      """
    When executing query:
      """
      MATCH (a)-[r:T]->(b) MATCH (a)-[r:T]->(b)
      RETURN a.name AS a, b.name AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 'x' | 'y' |
    And no side effects

  Scenario: Variable length relationship in OPTIONAL MATCH
    Given an empty graph
    And having executed:
      """
      CREATE (a:Q {name: 'a'})-[:L]->(:Q {name: 'b'})-[:L]->(:Q {name: 'c'}),
             (:Q {name: 'z'})
      """
    When executing query:
      """
      MATCH (q:Q) OPTIONAL MATCH (q)-[:L*2..2]->(t)
      RETURN q.name AS q, t.name AS t
      """
    Then the result should be, in any order:
      | q   | t    |
      | 'a' | 'c'  |
      | 'b' | null |
      | 'c' | null |
      | 'z' | null |
    And no side effects

  Scenario: SKIP with an expression that does not depend on variables
    Given an empty graph
    And having executed:
      """
      CREATE (:S {v: 1}), (:S {v: 2}), (:S {v: 3}), (:S {v: 4})
      """
    When executing query:
      """
      MATCH (s:S) RETURN s.v AS v ORDER BY v SKIP 1 + 1
      """
    Then the result should be, in order:
      | v |
      | 3 |
      | 4 |
    And no side effects

  Scenario: LIMIT with an expression that does not depend on variables
    Given an empty graph
    And having executed:
      """
      CREATE (:S {v: 1}), (:S {v: 2}), (:S {v: 3}), (:S {v: 4})
      """
    When executing query:
      """
      MATCH (s:S) RETURN s.v AS v ORDER BY v LIMIT 6 / 2
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Handling non-string operands for STARTS WITH
    Given any graph
    When executing query:
      """
      WITH 1 AS n
      RETURN n STARTS WITH 'a' AS a, 'a' STARTS WITH n AS b,
             n ENDS WITH 'a' AS c, n CONTAINS 'a' AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |
    And no side effects

  Scenario: Unwind does not remove variables from scope
    Given an empty graph
    And having executed:
      """
      CREATE (:K {name: 'k'})
      """
    When executing query:
      """
      MATCH (k:K) UNWIND [1, 2] AS i RETURN k.name AS name, i
      """
    Then the result should be, in any order:
      | name | i |
      | 'k'  | 1 |
      | 'k'  | 2 |
    And no side effects

  Scenario: Matching variable length patterns from a bound node
    Given an empty graph
    And having executed:
      """
      CREATE (a:V {name: 'a'})-[:E]->(:V {name: 'b'})-[:E]->(:V {name: 'c'})
      """
    When executing query:
      """
      MATCH (a:V {name: 'a'}) MATCH (a)-[:E*1..2]->(t)
      RETURN t.name AS t
      """
    Then the result should be, in any order:
      | t   |
      | 'b' |
      | 'c' |
    And no side effects

  Scenario: Handling fixed-length variable length pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:W {name: 'a'})-[:E]->(:W {name: 'b'})
      """
    When executing query:
      """
      MATCH (a:W)-[r:E*1..1]->(b:W) RETURN b.name AS b
      """
    Then the result should be, in any order:
      | b   |
      | 'b' |
    And no side effects
