Feature: ClauseInteractions

  # Round-7 corpus growth, part 3: cross-clause interactions — pattern
  # predicates inside CASE, comprehensions in WHERE and UNWIND, COUNT {}
  # composed into expressions, CALL/UNION nesting, var-length paths
  # inside correlated CALLs, DISTINCT+ORDER+LIMIT pipelines feeding later
  # MATCHes.

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:P {name: 'a', age: 10})-[:K {w: 5}]->(b:P {name: 'b', age: 20}),
             (b)-[:K {w: 7}]->(c:P {name: 'c', age: 30}),
             (a)-[:K {w: 9}]->(c)
      """

  Scenario: EXISTS pattern inside a CASE branch
    When executing query:
      """
      MATCH (p:P)
      RETURN p.name AS n,
             CASE WHEN EXISTS { (p)-[:K]->() } THEN 'out' ELSE 'sink' END AS kind
      """
    Then the result should be, in any order:
      | n   | kind   |
      | 'a' | 'out'  |
      | 'b' | 'out'  |
      | 'c' | 'sink' |
    And no side effects

  Scenario: Pattern comprehension size in WHERE
    When executing query:
      """
      MATCH (p:P)
      WHERE size([(p)-[:K]->(q) | q.name]) >= 2
      RETURN p.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |
    And no side effects

  Scenario: COUNT subquery composed into an expression
    When executing query:
      """
      MATCH (p:P)
      RETURN p.name AS n, COUNT { (p)-[:K]->() } + 1 AS c
      """
    Then the result should be, in any order:
      | n   | c |
      | 'a' | 3 |
      | 'b' | 2 |
      | 'c' | 1 |
    And no side effects

  Scenario: UNION inside an uncorrelated CALL deduplicates
    When executing query:
      """
      CALL { MATCH (p:P) RETURN p.name AS x
             UNION
             MATCH (p:P) WHERE p.age > 15 RETURN p.name AS x }
      RETURN count(x) AS c
      """
    Then the result should be, in any order:
      | c |
      | 3 |
    And no side effects

  Scenario: UNWIND over a pattern comprehension
    When executing query:
      """
      MATCH (p:P {name: 'a'})
      UNWIND [(p)-[:K]->(q) | q.age] AS qa
      RETURN sum(qa) AS total
      """
    Then the result should be, in any order:
      | total |
      | 50    |
    And no side effects

  Scenario: UNWIND over the nodes of a var-length path
    When executing query:
      """
      MATCH pth = (a:P {name: 'a'})-[:K*2..2]->(c)
      UNWIND nodes(pth) AS x
      RETURN x.name AS n
      """
    Then the result should be, in any order:
      | n   |
      | 'a' |
      | 'b' |
      | 'c' |
    And no side effects

  Scenario: Var-length path aggregated inside a correlated CALL
    When executing query:
      """
      MATCH (a:P {name: 'a'})
      CALL { WITH a MATCH p = (a)-[*]->(b) RETURN max(length(p)) AS maxl }
      RETURN a.name AS n, maxl
      """
    Then the result should be, in any order:
      | n   | maxl |
      | 'a' | 2    |
    And no side effects

  Scenario: WITH DISTINCT ORDER LIMIT feeding a later MATCH
    When executing query:
      """
      MATCH (p:P)-[:K]->()
      WITH DISTINCT p ORDER BY p.age DESC LIMIT 2
      MATCH (p)-[k2:K]->(q)
      RETURN p.name AS n, sum(k2.w) AS s
      """
    Then the result should be, in any order:
      | n   | s  |
      | 'a' | 14 |
      | 'b' | 7  |
    And no side effects

  Scenario: Aggregate of a CASE expression
    When executing query:
      """
      MATCH (p:P)
      RETURN sum(CASE WHEN p.age > 15 THEN 1 ELSE 0 END) AS older
      """
    Then the result should be, in any order:
      | older |
      | 2     |
    And no side effects

  Scenario: Double UNWIND with aggregation groups per outer element
    When executing query:
      """
      UNWIND [1, 2] AS x
      UNWIND [10, 20] AS y
      RETURN x, sum(y) AS s
      """
    Then the result should be, in any order:
      | x | s  |
      | 1 | 30 |
      | 2 | 30 |
    And no side effects

  Scenario: ORDER BY an aggregate alias with a grouped boolean key
    When executing query:
      """
      MATCH (p:P)
      RETURN p.age >= 20 AS grown, count(*) AS c ORDER BY c DESC, grown
      """
    Then the result should be, in order:
      | grown | c |
      | true  | 2 |
      | false | 1 |
    And no side effects
